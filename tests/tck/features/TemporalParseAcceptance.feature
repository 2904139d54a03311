Feature: TemporalParseAcceptance

  Scenario: Should parse date from string #1
    Given any graph
    When executing query:
      """
      RETURN date('1984-10-11') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should parse date from string #2
    Given any graph
    When executing query:
      """
      RETURN date('19841011') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should parse date from string #3
    Given any graph
    When executing query:
      """
      RETURN date('1984-10') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01' |
    And no side effects

  Scenario: Should parse date from string #4
    Given any graph
    When executing query:
      """
      RETURN date('1984-W28-3') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11' |
    And no side effects

  Scenario: Should parse date from string #5
    Given any graph
    When executing query:
      """
      RETURN date('1984W283') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11' |
    And no side effects

  Scenario: Should parse date from string #6
    Given any graph
    When executing query:
      """
      RETURN date('1984-W28') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-09' |
    And no side effects

  Scenario: Should parse date from string #7
    Given any graph
    When executing query:
      """
      RETURN date('1984-202') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-20' |
    And no side effects

  Scenario: Should parse date from string #8
    Given any graph
    When executing query:
      """
      RETURN date('1984202') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-20' |
    And no side effects

  Scenario: Should parse date from string #9
    Given any graph
    When executing query:
      """
      RETURN date('1984') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-01' |
    And no side effects

  Scenario: Should parse local date time from string #1
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12:31:14') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should parse local date time from string #2
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12:31') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:00' |
    And no side effects

  Scenario: Should parse local date time from string #3
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00' |
    And no side effects

  Scenario: Should parse local date time from string #4
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12:31:14.645') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should parse date time from string #1
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:31:14') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should parse date time from string #2
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:31') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:00' |
    And no side effects

  Scenario: Should parse date time from string #3
    Given any graph
    When executing query:
      """
      RETURN datetime('19841011T123114') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should parse date time from string #4
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-W28-3T12:31') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:31:00' |
    And no side effects

  Scenario: Should parse date time from string #5
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-202T12') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-20T12:00:00' |
    And no side effects

  Scenario: Should parse date time from string #6
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-Q3-45T12:31:14') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-08-14T12:31:14' |
    And no side effects

  Scenario: Should parse date time from string #7
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:31:14.645') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should parse date time from string #8
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:31:14.645876') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645876' |
    And no side effects

  Scenario: Should parse duration from string #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1Y')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y' |
    And no side effects

  Scenario: Should parse duration from string #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1M' |
    And no side effects

  Scenario: Should parse duration from string #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1W')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P7D' |
    And no side effects

  Scenario: Should parse duration from string #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1D')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1D' |
    And no side effects

  Scenario: Should parse duration from string #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT1H')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H' |
    And no side effects

  Scenario: Should parse duration from string #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT1M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1M' |
    And no side effects

  Scenario: Should parse duration from string #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT0.75S')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0.75S' |
    And no side effects

  Scenario: Should parse time from string #1
    Given any graph
    When executing query:
      """
      RETURN time('12:31:14') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14Z' |
    And no side effects

  Scenario: Should parse time from string #2
    Given any graph
    When executing query:
      """
      RETURN time('12:31') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00Z' |
    And no side effects

  Scenario: Should parse time from string #3
    Given any graph
    When executing query:
      """
      RETURN time('1231') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00Z' |
    And no side effects

  Scenario: Should parse time from string #4
    Given any graph
    When executing query:
      """
      RETURN time('12') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00Z' |
    And no side effects

  Scenario: Should parse time from string #5
    Given any graph
    When executing query:
      """
      RETURN time('12:31:14.645') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645Z' |
    And no side effects

  Scenario: Should parse time from string #6
    Given any graph
    When executing query:
      """
      RETURN time('12:31:14Z') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14Z' |
    And no side effects

  Scenario: Should parse time from string #7
    Given any graph
    When executing query:
      """
      RETURN time('12:31:14+01:00') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14+01:00' |
    And no side effects

  Scenario: Should parse time from string #8
    Given any graph
    When executing query:
      """
      RETURN time('12:31:14.645876-05:30') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876-05:30' |
    And no side effects

  Scenario: Should parse local time from string #1
    Given any graph
    When executing query:
      """
      RETURN localtime('12:31:14') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14' |
    And no side effects

  Scenario: Should parse local time from string #2
    Given any graph
    When executing query:
      """
      RETURN localtime('12:31') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects

  Scenario: Should parse local time from string #3
    Given any graph
    When executing query:
      """
      RETURN localtime('1231') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects

  Scenario: Should parse local time from string #4
    Given any graph
    When executing query:
      """
      RETURN localtime('12') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00' |
    And no side effects

  Scenario: Should parse local time from string #5
    Given any graph
    When executing query:
      """
      RETURN localtime('12:31:14.645') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should parse local time from string #6
    Given any graph
    When executing query:
      """
      RETURN localtime('12:31:14.645876') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876' |
    And no side effects

  Scenario: Should parse local time from string #7
    Given any graph
    When executing query:
      """
      RETURN localtime('00:00') AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should parse date time with named time zone from string #1
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:00[Europe/Stockholm]') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00+01:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should parse date time with named time zone from string #2
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-07-11T12:31:14[Europe/Stockholm]') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:31:14+02:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should parse date time with named time zone from string #3
    Given any graph
    When executing query:
      """
      RETURN datetime('2000-02-29T23:59:59[America/New_York]') AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59-05:00[America/New_York]' |
    And no side effects

  Scenario: Should parse date time with named time zone from string #4
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:00+09:00[Asia/Tokyo]') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00+09:00[Asia/Tokyo]' |
    And no side effects

  Scenario: Should parse date time with named time zone from string #5
    Given any graph
    When executing query:
      """
      RETURN datetime('2024-01-01T00:00[Pacific/Auckland]') AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00+13:00[Pacific/Auckland]' |
    And no side effects
