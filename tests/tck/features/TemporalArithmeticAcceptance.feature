Feature: TemporalArithmeticAcceptance

  Scenario: Should add or subtract durations #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1Y2M') + duration('P3M4D')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y5M4D' |
    And no side effects

  Scenario: Should add or subtract durations #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1Y2M') - duration('P3M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P11M' |
    And no side effects

  Scenario: Should add or subtract durations #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT10H') + duration('PT5H30M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT15H30M' |
    And no side effects

  Scenario: Should add or subtract durations #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT10H') - duration('PT12H')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-2H' |
    And no side effects

  Scenario: Should add or subtract durations #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1D') + duration('PT25H')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1DT25H' |
    And no side effects

  Scenario: Should add or subtract durations #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1M') - duration('P40D')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1M-40D' |
    And no side effects

  Scenario: Should add or subtract durations #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1Y') + duration('-P2M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P10M' |
    And no side effects

  Scenario: Should add or subtract durations #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration('-PT30M') + duration('PT1H')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT30M' |
    And no side effects

  Scenario: Should add or subtract durations #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1DT12H') - duration('PT36H')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1DT-24H' |
    And no side effects

  Scenario: Should multiply or divide durations by numbers #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P2M4DT6H') * 2) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P4M8DT12H' |
    And no side effects

  Scenario: Should multiply or divide durations by numbers #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P4M8DT12H') / 2) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P2M4DT6H' |
    And no side effects

  Scenario: Should multiply or divide durations by numbers #3
    Given any graph
    When executing query:
      """
      RETURN toString(3 * duration('PT30M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H30M' |
    And no side effects

  Scenario: Should add or subtract duration to or from date #2
    Given any graph
    When executing query:
      """
      RETURN date('1984-10-11') + duration('P1Y2M3D') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1985-12-14' |
    And no side effects

  Scenario: Should add or subtract duration to or from date #3
    Given any graph
    When executing query:
      """
      RETURN date('1984-10-11') - duration('P1Y2M3D') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1983-08-08' |
    And no side effects

  Scenario: Should add or subtract duration to or from local date time #1
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12:31:14') + duration('P1Y2M3DT4H5M6S') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1985-12-14T16:36:20' |
    And no side effects

  Scenario: Should add or subtract duration to or from local date time #2
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12:31:14') - duration('PT13H') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-10T23:31:14' |
    And no side effects

  Scenario: Should add or subtract duration to or from local date time #3
    Given any graph
    When executing query:
      """
      RETURN localdatetime('2020-01-31T00:00:00') + duration('P1M') AS d
      """
    Then the result should be, in any order:
      | d |
      | '2020-02-29T00:00:00' |
    And no side effects

  Scenario: Should add or subtract duration to or from date time #1
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:31:14') + duration('P1Y2M3DT4H5M6S') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1985-12-14T16:36:20' |
    And no side effects

  Scenario: Should add or subtract duration to or from date time #2
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:31:14') - duration('PT13H') AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-10T23:31:14' |
    And no side effects

  Scenario: Should add or subtract duration to or from date time #3
    Given any graph
    When executing query:
      """
      RETURN datetime('2020-02-29T12:00:00') + duration('P1Y') AS d
      """
    Then the result should be, in any order:
      | d |
      | '2021-02-28T12:00:00' |
    And no side effects

  Scenario: Should add or subtract duration to or from time #1
    Given any graph
    When executing query:
      """
      RETURN time('12:00Z') + duration('PT1H') AS t
      """
    Then the result should be, in any order:
      | t |
      | '13:00:00Z' |
    And no side effects

  Scenario: Should add or subtract duration to or from time #2
    Given any graph
    When executing query:
      """
      RETURN time('23:30+01:00') + duration('PT45M') AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:15:00+01:00' |
    And no side effects

  Scenario: Should add or subtract duration to or from time #3
    Given any graph
    When executing query:
      """
      RETURN time('06:15:30.5Z') - duration('P1DT2H') AS t
      """
    Then the result should be, in any order:
      | t |
      | '04:15:30.5Z' |
    And no side effects

  Scenario: Should add or subtract duration to or from local time #1
    Given any graph
    When executing query:
      """
      RETURN localtime('12:00') - duration('PT1H') AS t
      """
    Then the result should be, in any order:
      | t |
      | '11:00:00' |
    And no side effects

  Scenario: Should add or subtract duration to or from local time #2
    Given any graph
    When executing query:
      """
      RETURN localtime('23:59:59') + duration('PT2S') AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:01' |
    And no side effects

  Scenario: Should add or subtract duration to or from local time #3
    Given any graph
    When executing query:
      """
      RETURN localtime('12:31:14') + duration('P1YT30M') AS t
      """
    Then the result should be, in any order:
      | t |
      | '13:01:14' |
    And no side effects
