Feature: TemporalToStringAcceptance

  Scenario: Should serialize date
    Given any graph
    When executing query:
      """
      RETURN toString(date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should serialize local date time
    Given any graph
    When executing query:
      """
      RETURN toString(localdatetime('1984-10-11T12:31:14.645876')) AS a, toString(localdatetime('1984-10-11T12:31:14')) AS b
      """
    Then the result should be, in any order:
      | a | b |
      | '1984-10-11T12:31:14.645876' | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should serialize date time
    Given any graph
    When executing query:
      """
      RETURN toString(datetime('1984-10-11T12:31:14.645')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645' |
    And no side effects

  Scenario: Should serialize time
    Given any graph
    When executing query:
      """
      RETURN toString(time('12:31:14.645+01:00')) AS a, toString(time('12:31:14Z')) AS b
      """
    Then the result should be, in any order:
      | a | b |
      | '12:31:14.645+01:00' | '12:31:14Z' |
    And no side effects

  Scenario: Should serialize local time
    Given any graph
    When executing query:
      """
      RETURN toString(localtime('12:31:14.645')) AS a, toString(localtime('12:31')) AS b
      """
    Then the result should be, in any order:
      | a | b |
      | '12:31:14.645' | '12:31:00' |
    And no side effects

  Scenario: Should serialize timezones correctly
    Given any graph
    When executing query:
      """
      RETURN toString(datetime('1984-10-11T12:00[Europe/Stockholm]')) AS a, toString(datetime('1984-10-11T12:00+05:45')) AS b, toString(datetime('1984-10-11T12:00Z')) AS c
      """
    Then the result should be, in any order:
      | a | b | c |
      | '1984-10-11T12:00:00+01:00[Europe/Stockholm]' | '1984-10-11T12:00:00+05:45' | '1984-10-11T12:00:00Z' |
    And no side effects

  Scenario: Should serialize duration #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1Y')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y' |
    And no side effects

  Scenario: Should serialize duration #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1M' |
    And no side effects

  Scenario: Should serialize duration #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1D')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1D' |
    And no side effects

  Scenario: Should serialize duration #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT1H')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H' |
    And no side effects

  Scenario: Should serialize duration #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT1M')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1M' |
    And no side effects

  Scenario: Should serialize duration #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT1S')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1S' |
    And no side effects

  Scenario: Should serialize duration #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT0.5S')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0.5S' |
    And no side effects

  Scenario: Should serialize duration #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1Y2M3DT4H5M6.789S')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y2M3DT4H5M6.789S' |
    And no side effects

  Scenario: Should serialize duration #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration('-P1Y')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-1Y' |
    And no side effects

  Scenario: Should serialize duration #10
    Given any graph
    When executing query:
      """
      RETURN toString(duration('PT0S')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should serialize duration #11
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1W')) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P7D' |
    And no side effects
