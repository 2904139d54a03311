Feature: TemporalTruncateAcceptance

  Scenario: Should truncate localdatetime #1
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millennium', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #2
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('century', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #3
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('decade', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2010-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #4
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('year', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #5
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('weekYear', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-02T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #6
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('quarter', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-10-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #7
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('month', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #8
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('week', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-06T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #9
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #10
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('hour', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #11
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('minute', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:00' |
    And no side effects

  Scenario: Should truncate localdatetime #12
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('second', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14' |
    And no side effects

  Scenario: Should truncate localdatetime #13
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millisecond', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14.645000' |
    And no side effects

  Scenario: Should truncate localdatetime #14
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('microsecond', localdatetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14.645876' |
    And no side effects

  Scenario: Should truncate localdatetime #15
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('month', localdatetime('2017-11-11T12:31:14.645876'), {day: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-05T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #16
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('year', localdatetime('2017-11-11T12:31:14.645876'), {month: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-02-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #17
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', localdatetime('2017-11-11T12:31:14.645876'), {hour: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T10:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #18
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('second', localdatetime('2017-11-11T12:31:14.645876'), {microsecond: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14.000042' |
    And no side effects

  Scenario: Should truncate localdatetime #19
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('week', localdatetime('2017-11-11T12:31:14.645876'), {dayOfWeek: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-07T00:00:00' |
    And no side effects

  Scenario: Should truncate date #1
    Given any graph
    When executing query:
      """
      RETURN date.truncate('millennium', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01' |
    And no side effects

  Scenario: Should truncate date #2
    Given any graph
    When executing query:
      """
      RETURN date.truncate('century', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01' |
    And no side effects

  Scenario: Should truncate date #3
    Given any graph
    When executing query:
      """
      RETURN date.truncate('decade', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1980-01-01' |
    And no side effects

  Scenario: Should truncate date #4
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-01' |
    And no side effects

  Scenario: Should truncate date #5
    Given any graph
    When executing query:
      """
      RETURN date.truncate('weekYear', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-02' |
    And no side effects

  Scenario: Should truncate date #6
    Given any graph
    When executing query:
      """
      RETURN date.truncate('quarter', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01' |
    And no side effects

  Scenario: Should truncate date #7
    Given any graph
    When executing query:
      """
      RETURN date.truncate('month', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01' |
    And no side effects

  Scenario: Should truncate date #8
    Given any graph
    When executing query:
      """
      RETURN date.truncate('week', date('1984-10-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-08' |
    And no side effects

  Scenario: Should truncate time #1
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time({hour: 12, minute: 31, second: 14})) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00Z' |
    And no side effects

  Scenario: Should truncate localtime #1
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime({hour: 12, minute: 31, second: 14})) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects

  Scenario: Should truncate time #2
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time({hour: 12, minute: 31, second: 14})) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00Z' |
    And no side effects

  Scenario: Should truncate localtime #2
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime({hour: 12, minute: 31, second: 14})) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects
