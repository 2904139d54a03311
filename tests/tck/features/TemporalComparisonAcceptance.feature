Feature: TemporalComparisonAcceptance

  Scenario: Should compare dates #1
    Given any graph
    When executing query:
      """
      RETURN date('1984-10-11') < date('2015-06-24') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare dates #2
    Given any graph
    When executing query:
      """
      RETURN date('2015-06-24') <= date('2015-06-24') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare local date times #1
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12:31:14') < localdatetime('1984-10-11T12:31:15') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare local date times #2
    Given any graph
    When executing query:
      """
      RETURN localdatetime('1984-10-11T12:31:14.645') >= localdatetime('1984-10-11T12:31:14.646') AS r
      """
    Then the result should be, in any order:
      | r |
      | false |
    And no side effects

  Scenario: Should compare date times #1
    Given any graph
    When executing query:
      """
      RETURN datetime('1984-10-11T12:31:14') < datetime('1984-10-12T00:00:00') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare date times #2
    Given any graph
    When executing query:
      """
      RETURN datetime('2015-06-24T12:00:00') > datetime('2015-06-24T12:00:00.001') AS r
      """
    Then the result should be, in any order:
      | r |
      | false |
    And no side effects

  Scenario: Should compare times #1
    Given any graph
    When executing query:
      """
      RETURN time('12:00+01:00') < time('11:30Z') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare times #2
    Given any graph
    When executing query:
      """
      RETURN time('09:00-05:00') <= time('14:00Z') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare local times #1
    Given any graph
    When executing query:
      """
      RETURN localtime('12:00') < localtime('12:01') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare local times #2
    Given any graph
    When executing query:
      """
      RETURN localtime('23:59:59.999999') > localtime('23:59:59') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare durations for equality #1
    Given any graph
    When executing query:
      """
      RETURN duration('PT60S') = duration('PT1M') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare durations for equality #2
    Given any graph
    When executing query:
      """
      RETURN duration('P1M') = duration('P30D') AS r
      """
    Then the result should be, in any order:
      | r |
      | false |
    And no side effects

  Scenario: Should compare durations for equality #3
    Given any graph
    When executing query:
      """
      RETURN duration('P1Y') = duration('P12M') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare durations for equality #4
    Given any graph
    When executing query:
      """
      RETURN duration('P1D') = duration('PT24H') AS r
      """
    Then the result should be, in any order:
      | r |
      | false |
    And no side effects

  Scenario: Should compare durations for equality #5
    Given any graph
    When executing query:
      """
      RETURN duration({seconds: 1, milliseconds: 500}) = duration({seconds: 1.5}) AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare durations for equality #6
    Given any graph
    When executing query:
      """
      RETURN duration('P1M') <> duration('P2M') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare durations for equality #7
    Given any graph
    When executing query:
      """
      RETURN duration('PT1H') = duration('PT3600S') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects

  Scenario: Should compare durations for equality #8
    Given any graph
    When executing query:
      """
      RETURN duration('P1Y') <> duration('P365D') AS r
      """
    Then the result should be, in any order:
      | r |
      | true |
    And no side effects
