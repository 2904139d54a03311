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
      RETURN localdatetime.truncate('millennium', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #16
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('century', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #17
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('decade', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1980-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #18
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('year', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #19
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('weekYear', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-02T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #20
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('quarter', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #21
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('month', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #22
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('week', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-08T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #23
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #24
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('hour', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #25
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('minute', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:00' |
    And no side effects

  Scenario: Should truncate localdatetime #26
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('second', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should truncate localdatetime #27
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millisecond', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should truncate localdatetime #28
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('microsecond', localdatetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should truncate localdatetime #29
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millennium', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #30
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('century', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #31
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('decade', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #32
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('year', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #33
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('weekYear', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-03T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #34
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('quarter', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #35
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('month', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #36
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('week', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-28T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #37
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #38
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('hour', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #39
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('minute', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:00' |
    And no side effects

  Scenario: Should truncate localdatetime #40
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('second', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59' |
    And no side effects

  Scenario: Should truncate localdatetime #41
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millisecond', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59.999000' |
    And no side effects

  Scenario: Should truncate localdatetime #42
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('microsecond', localdatetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59.999999' |
    And no side effects

  Scenario: Should truncate localdatetime #43
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millennium', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #44
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('century', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #45
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('decade', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1960-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #46
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('year', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #47
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('weekYear', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1968-12-30T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #48
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('quarter', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #49
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('month', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #50
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('week', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-14T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #51
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #52
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('hour', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #53
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('minute', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:00' |
    And no side effects

  Scenario: Should truncate localdatetime #54
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('second', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:40' |
    And no side effects

  Scenario: Should truncate localdatetime #55
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millisecond', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:40' |
    And no side effects

  Scenario: Should truncate localdatetime #56
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('microsecond', localdatetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:40' |
    And no side effects

  Scenario: Should truncate localdatetime #57
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millennium', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #58
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('century', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #59
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('decade', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2020-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #60
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('year', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #61
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('weekYear', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #62
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('quarter', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #63
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('month', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #64
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('week', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #65
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #66
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('hour', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #67
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('minute', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #68
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('second', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #69
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('millisecond', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #70
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('microsecond', localdatetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00.000001' |
    And no side effects

  Scenario: Should truncate localdatetime #71
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('month', localdatetime('2017-11-11T12:31:14.645876'), {day: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-05T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #72
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', localdatetime('2017-11-11T12:31:14.645876'), {hour: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T10:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #73
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('week', localdatetime('2017-11-11T12:31:14.645876'), {dayOfWeek: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-07T00:00:00' |
    And no side effects

  Scenario: Should truncate localdatetime #74
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('second', localdatetime('2017-11-11T12:31:14.645876'), {microsecond: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14.000042' |
    And no side effects

  Scenario: Should truncate datetime #1
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millennium', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #2
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('century', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #3
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('decade', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2010-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #4
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #5
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('weekYear', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-02T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #6
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('quarter', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-10-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #7
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #8
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-06T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #9
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #10
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:00:00' |
    And no side effects

  Scenario: Should truncate datetime #11
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:00' |
    And no side effects

  Scenario: Should truncate datetime #12
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14' |
    And no side effects

  Scenario: Should truncate datetime #13
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millisecond', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14.645000' |
    And no side effects

  Scenario: Should truncate datetime #14
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('microsecond', datetime('2017-11-11T12:31:14.645876')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14.645876' |
    And no side effects

  Scenario: Should truncate datetime #15
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millennium', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #16
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('century', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #17
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('decade', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1980-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #18
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #19
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('weekYear', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-02T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #20
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('quarter', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #21
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #22
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-08T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #23
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #24
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00' |
    And no side effects

  Scenario: Should truncate datetime #25
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:00' |
    And no side effects

  Scenario: Should truncate datetime #26
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should truncate datetime #27
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millisecond', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should truncate datetime #28
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('microsecond', datetime('1984-10-11T12:31:14.645000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should truncate datetime #29
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millennium', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #30
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('century', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #31
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('decade', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #32
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #33
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('weekYear', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-03T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #34
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('quarter', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #35
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #36
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-28T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #37
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #38
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:00:00' |
    And no side effects

  Scenario: Should truncate datetime #39
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:00' |
    And no side effects

  Scenario: Should truncate datetime #40
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59' |
    And no side effects

  Scenario: Should truncate datetime #41
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millisecond', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59.999000' |
    And no side effects

  Scenario: Should truncate datetime #42
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('microsecond', datetime('2000-02-29T23:59:59.999999')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59.999999' |
    And no side effects

  Scenario: Should truncate datetime #43
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millennium', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #44
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('century', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #45
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('decade', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1960-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #46
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #47
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('weekYear', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1968-12-30T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #48
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('quarter', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #49
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #50
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-14T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #51
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #52
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:00:00' |
    And no side effects

  Scenario: Should truncate datetime #53
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:00' |
    And no side effects

  Scenario: Should truncate datetime #54
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:40' |
    And no side effects

  Scenario: Should truncate datetime #55
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millisecond', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:40' |
    And no side effects

  Scenario: Should truncate datetime #56
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('microsecond', datetime('1969-07-20T20:17:40')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-20T20:17:40' |
    And no side effects

  Scenario: Should truncate datetime #57
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millennium', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #58
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('century', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #59
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('decade', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2020-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #60
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #61
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('weekYear', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #62
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('quarter', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #63
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #64
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #65
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #66
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #67
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #68
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #69
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millisecond', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #70
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('microsecond', datetime('2024-01-01T00:00:00.000001')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00.000001' |
    And no side effects

  Scenario: Should truncate datetime #71
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millennium', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #72
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('century', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #73
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('decade', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #74
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #75
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('weekYear', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-12-31T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #76
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('quarter', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-10-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #77
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #78
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-09T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #79
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-14T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #80
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-14T03:00:00' |
    And no side effects

  Scenario: Should truncate datetime #81
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-14T03:03:00' |
    And no side effects

  Scenario: Should truncate datetime #82
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-14T03:03:03' |
    And no side effects

  Scenario: Should truncate datetime #83
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millisecond', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-14T03:03:03.300000' |
    And no side effects

  Scenario: Should truncate datetime #84
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('microsecond', datetime('1901-12-14T03:03:03.300000')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-12-14T03:03:03.300000' |
    And no side effects

  Scenario: Should truncate datetime #85
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millennium', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #86
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('century', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2300-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #87
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('decade', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2340-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #88
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #89
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('weekYear', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-01-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #90
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('quarter', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-04-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #91
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #92
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-04T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #93
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-07T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #94
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-07T08:00:00' |
    And no side effects

  Scenario: Should truncate datetime #95
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-07T08:09:00' |
    And no side effects

  Scenario: Should truncate datetime #96
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-07T08:09:10' |
    And no side effects

  Scenario: Should truncate datetime #97
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('millisecond', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-07T08:09:10' |
    And no side effects

  Scenario: Should truncate datetime #98
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('microsecond', datetime('2345-06-07T08:09:10')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2345-06-07T08:09:10' |
    And no side effects

  Scenario: Should truncate datetime #99
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('month', datetime('2017-11-11T12:31:14.645876'), {day: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-05T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #100
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('year', datetime('2017-11-11T12:31:14.645876'), {month: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-02-01T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #101
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', datetime('2017-11-11T12:31:14.645876'), {hour: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T10:00:00' |
    And no side effects

  Scenario: Should truncate datetime #102
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('week', datetime('2017-11-11T12:31:14.645876'), {dayOfWeek: 3}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-08T00:00:00' |
    And no side effects

  Scenario: Should truncate datetime #103
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('second', datetime('2017-11-11T12:31:14.645876'), {microsecond: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:14.000042' |
    And no side effects

  Scenario: Should truncate datetime #104
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('minute', datetime('2017-11-11T12:31:14.645876'), {second: 30}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:31:30' |
    And no side effects

  Scenario: Should truncate datetime #105
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('hour', datetime('2017-11-11T12:31:14.645876'), {minute: 59}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-11T12:59:00' |
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

  Scenario: Should truncate date #9
    Given any graph
    When executing query:
      """
      RETURN date.truncate('millennium', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #10
    Given any graph
    When executing query:
      """
      RETURN date.truncate('century', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #11
    Given any graph
    When executing query:
      """
      RETURN date.truncate('decade', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #12
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #13
    Given any graph
    When executing query:
      """
      RETURN date.truncate('weekYear', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-03' |
    And no side effects

  Scenario: Should truncate date #14
    Given any graph
    When executing query:
      """
      RETURN date.truncate('quarter', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #15
    Given any graph
    When executing query:
      """
      RETURN date.truncate('month', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-01' |
    And no side effects

  Scenario: Should truncate date #16
    Given any graph
    When executing query:
      """
      RETURN date.truncate('week', date('2000-02-29')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-28' |
    And no side effects

  Scenario: Should truncate date #17
    Given any graph
    When executing query:
      """
      RETURN date.truncate('millennium', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #18
    Given any graph
    When executing query:
      """
      RETURN date.truncate('century', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #19
    Given any graph
    When executing query:
      """
      RETURN date.truncate('decade', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2010-01-01' |
    And no side effects

  Scenario: Should truncate date #20
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-01' |
    And no side effects

  Scenario: Should truncate date #21
    Given any graph
    When executing query:
      """
      RETURN date.truncate('weekYear', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-02' |
    And no side effects

  Scenario: Should truncate date #22
    Given any graph
    When executing query:
      """
      RETURN date.truncate('quarter', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-10-01' |
    And no side effects

  Scenario: Should truncate date #23
    Given any graph
    When executing query:
      """
      RETURN date.truncate('month', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-01' |
    And no side effects

  Scenario: Should truncate date #24
    Given any graph
    When executing query:
      """
      RETURN date.truncate('week', date('2017-11-11')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-11-06' |
    And no side effects

  Scenario: Should truncate date #25
    Given any graph
    When executing query:
      """
      RETURN date.truncate('millennium', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01' |
    And no side effects

  Scenario: Should truncate date #26
    Given any graph
    When executing query:
      """
      RETURN date.truncate('century', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01' |
    And no side effects

  Scenario: Should truncate date #27
    Given any graph
    When executing query:
      """
      RETURN date.truncate('decade', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1960-01-01' |
    And no side effects

  Scenario: Should truncate date #28
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-01-01' |
    And no side effects

  Scenario: Should truncate date #29
    Given any graph
    When executing query:
      """
      RETURN date.truncate('weekYear', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1968-12-30' |
    And no side effects

  Scenario: Should truncate date #30
    Given any graph
    When executing query:
      """
      RETURN date.truncate('quarter', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-01' |
    And no side effects

  Scenario: Should truncate date #31
    Given any graph
    When executing query:
      """
      RETURN date.truncate('month', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-01' |
    And no side effects

  Scenario: Should truncate date #32
    Given any graph
    When executing query:
      """
      RETURN date.truncate('week', date('1969-07-20')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-07-14' |
    And no side effects

  Scenario: Should truncate date #33
    Given any graph
    When executing query:
      """
      RETURN date.truncate('millennium', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #34
    Given any graph
    When executing query:
      """
      RETURN date.truncate('century', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-01-01' |
    And no side effects

  Scenario: Should truncate date #35
    Given any graph
    When executing query:
      """
      RETURN date.truncate('decade', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2020-01-01' |
    And no side effects

  Scenario: Should truncate date #36
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01' |
    And no side effects

  Scenario: Should truncate date #37
    Given any graph
    When executing query:
      """
      RETURN date.truncate('weekYear', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-12-30' |
    And no side effects

  Scenario: Should truncate date #38
    Given any graph
    When executing query:
      """
      RETURN date.truncate('quarter', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-10-01' |
    And no side effects

  Scenario: Should truncate date #39
    Given any graph
    When executing query:
      """
      RETURN date.truncate('month', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-12-01' |
    And no side effects

  Scenario: Should truncate date #40
    Given any graph
    When executing query:
      """
      RETURN date.truncate('week', date('2024-12-31')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-12-30' |
    And no side effects

  Scenario: Should truncate date #41
    Given any graph
    When executing query:
      """
      RETURN date.truncate('millennium', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1000-01-01' |
    And no side effects

  Scenario: Should truncate date #42
    Given any graph
    When executing query:
      """
      RETURN date.truncate('century', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01' |
    And no side effects

  Scenario: Should truncate date #43
    Given any graph
    When executing query:
      """
      RETURN date.truncate('decade', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-01-01' |
    And no side effects

  Scenario: Should truncate date #44
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-01-01' |
    And no side effects

  Scenario: Should truncate date #45
    Given any graph
    When executing query:
      """
      RETURN date.truncate('weekYear', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-12-31' |
    And no side effects

  Scenario: Should truncate date #46
    Given any graph
    When executing query:
      """
      RETURN date.truncate('quarter', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-01-01' |
    And no side effects

  Scenario: Should truncate date #47
    Given any graph
    When executing query:
      """
      RETURN date.truncate('month', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1901-01-01' |
    And no side effects

  Scenario: Should truncate date #48
    Given any graph
    When executing query:
      """
      RETURN date.truncate('week', date('1901-01-01')) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1900-12-31' |
    And no side effects

  Scenario: Should truncate date #49
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', date('1984-10-11'), {month: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-02-01' |
    And no side effects

  Scenario: Should truncate date #50
    Given any graph
    When executing query:
      """
      RETURN date.truncate('month', date('1984-10-11'), {day: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-05' |
    And no side effects

  Scenario: Should truncate date #51
    Given any graph
    When executing query:
      """
      RETURN date.truncate('week', date('1984-10-11'), {dayOfWeek: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-09' |
    And no side effects

  Scenario: Should truncate time #1
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('12:31:14.645876Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #2
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('12:31:14.645876Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00Z' |
    And no side effects

  Scenario: Should truncate time #3
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('12:31:14.645876Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00Z' |
    And no side effects

  Scenario: Should truncate time #4
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('12:31:14.645876Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14Z' |
    And no side effects

  Scenario: Should truncate time #5
    Given any graph
    When executing query:
      """
      RETURN time.truncate('millisecond', time('12:31:14.645876Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645Z' |
    And no side effects

  Scenario: Should truncate time #6
    Given any graph
    When executing query:
      """
      RETURN time.truncate('microsecond', time('12:31:14.645876Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876Z' |
    And no side effects

  Scenario: Should truncate time #7
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('12:31:14.645+01:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00+01:00' |
    And no side effects

  Scenario: Should truncate time #8
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('12:31:14.645+01:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00+01:00' |
    And no side effects

  Scenario: Should truncate time #9
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('12:31:14.645+01:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00+01:00' |
    And no side effects

  Scenario: Should truncate time #10
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('12:31:14.645+01:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14+01:00' |
    And no side effects

  Scenario: Should truncate time #11
    Given any graph
    When executing query:
      """
      RETURN time.truncate('millisecond', time('12:31:14.645+01:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645+01:00' |
    And no side effects

  Scenario: Should truncate time #12
    Given any graph
    When executing query:
      """
      RETURN time.truncate('microsecond', time('12:31:14.645+01:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645+01:00' |
    And no side effects

  Scenario: Should truncate time #13
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('12:31:14-05:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00-05:30' |
    And no side effects

  Scenario: Should truncate time #14
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('12:31:14-05:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00-05:30' |
    And no side effects

  Scenario: Should truncate time #15
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('12:31:14-05:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00-05:30' |
    And no side effects

  Scenario: Should truncate time #16
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('12:31:14-05:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14-05:30' |
    And no side effects

  Scenario: Should truncate time #17
    Given any graph
    When executing query:
      """
      RETURN time.truncate('millisecond', time('12:31:14-05:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14-05:30' |
    And no side effects

  Scenario: Should truncate time #18
    Given any graph
    When executing query:
      """
      RETURN time.truncate('microsecond', time('12:31:14-05:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14-05:30' |
    And no side effects

  Scenario: Should truncate time #19
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('23:59:59.999999Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #20
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('23:59:59.999999Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:00:00Z' |
    And no side effects

  Scenario: Should truncate time #21
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('23:59:59.999999Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:00Z' |
    And no side effects

  Scenario: Should truncate time #22
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('23:59:59.999999Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59Z' |
    And no side effects

  Scenario: Should truncate time #23
    Given any graph
    When executing query:
      """
      RETURN time.truncate('millisecond', time('23:59:59.999999Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59.999Z' |
    And no side effects

  Scenario: Should truncate time #24
    Given any graph
    When executing query:
      """
      RETURN time.truncate('microsecond', time('23:59:59.999999Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59.999999Z' |
    And no side effects

  Scenario: Should truncate time #25
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('00:00:00Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #26
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('00:00:00Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #27
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('00:00:00Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #28
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('00:00:00Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #29
    Given any graph
    When executing query:
      """
      RETURN time.truncate('millisecond', time('00:00:00Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #30
    Given any graph
    When executing query:
      """
      RETURN time.truncate('microsecond', time('00:00:00Z')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should truncate time #31
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('06:15:30.5+01:00:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00+01:00:30' |
    And no side effects

  Scenario: Should truncate time #32
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('06:15:30.5+01:00:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:00:00+01:00:30' |
    And no side effects

  Scenario: Should truncate time #33
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('06:15:30.5+01:00:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:00+01:00:30' |
    And no side effects

  Scenario: Should truncate time #34
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('06:15:30.5+01:00:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:30+01:00:30' |
    And no side effects

  Scenario: Should truncate time #35
    Given any graph
    When executing query:
      """
      RETURN time.truncate('millisecond', time('06:15:30.5+01:00:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:30.5+01:00:30' |
    And no side effects

  Scenario: Should truncate time #36
    Given any graph
    When executing query:
      """
      RETURN time.truncate('microsecond', time('06:15:30.5+01:00:30')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:30.5+01:00:30' |
    And no side effects

  Scenario: Should truncate time #37
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('18:45:00+14:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00+14:00' |
    And no side effects

  Scenario: Should truncate time #38
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('18:45:00+14:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '18:00:00+14:00' |
    And no side effects

  Scenario: Should truncate time #39
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('18:45:00+14:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '18:45:00+14:00' |
    And no side effects

  Scenario: Should truncate time #40
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('18:45:00+14:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '18:45:00+14:00' |
    And no side effects

  Scenario: Should truncate time #41
    Given any graph
    When executing query:
      """
      RETURN time.truncate('millisecond', time('18:45:00+14:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '18:45:00+14:00' |
    And no side effects

  Scenario: Should truncate time #42
    Given any graph
    When executing query:
      """
      RETURN time.truncate('microsecond', time('18:45:00+14:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '18:45:00+14:00' |
    And no side effects

  Scenario: Should truncate time #43
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('12:31:14.645876Z'), {second: 30}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:30Z' |
    And no side effects

  Scenario: Should truncate time #44
    Given any graph
    When executing query:
      """
      RETURN time.truncate('hour', time('12:31:14.645876Z'), {minute: 59}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:59:00Z' |
    And no side effects

  Scenario: Should truncate time #45
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('12:31:14.645876Z'), {millisecond: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.002Z' |
    And no side effects

  Scenario: Should truncate time #46
    Given any graph
    When executing query:
      """
      RETURN time.truncate('second', time('12:31:14.645876Z'), {microsecond: 42}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.000042Z' |
    And no side effects

  Scenario: Should truncate time #47
    Given any graph
    When executing query:
      """
      RETURN time.truncate('day', time('12:31:14.645876Z'), {hour: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '05:00:00Z' |
    And no side effects

  Scenario: Should truncate time #48
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', time('12:31:14.645876Z'), {second: 1, millisecond: 1}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:01.001Z' |
    And no side effects

  Scenario: Should truncate localtime #1
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('day', localtime('12:31:14.645876')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #2
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('12:31:14.645876')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00' |
    And no side effects

  Scenario: Should truncate localtime #3
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('12:31:14.645876')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects

  Scenario: Should truncate localtime #4
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('12:31:14.645876')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14' |
    And no side effects

  Scenario: Should truncate localtime #5
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('millisecond', localtime('12:31:14.645876')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should truncate localtime #6
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('microsecond', localtime('12:31:14.645876')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876' |
    And no side effects

  Scenario: Should truncate localtime #7
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('day', localtime('12:31:14.645')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #8
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('12:31:14.645')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00' |
    And no side effects

  Scenario: Should truncate localtime #9
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('12:31:14.645')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects

  Scenario: Should truncate localtime #10
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('12:31:14.645')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14' |
    And no side effects

  Scenario: Should truncate localtime #11
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('millisecond', localtime('12:31:14.645')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should truncate localtime #12
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('microsecond', localtime('12:31:14.645')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should truncate localtime #13
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('day', localtime('12:31:14')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #14
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('12:31:14')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00' |
    And no side effects

  Scenario: Should truncate localtime #15
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('12:31:14')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects

  Scenario: Should truncate localtime #16
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('12:31:14')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14' |
    And no side effects

  Scenario: Should truncate localtime #17
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('millisecond', localtime('12:31:14')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14' |
    And no side effects

  Scenario: Should truncate localtime #18
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('microsecond', localtime('12:31:14')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14' |
    And no side effects

  Scenario: Should truncate localtime #19
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('day', localtime('23:59:59.999999')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #20
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('23:59:59.999999')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:00:00' |
    And no side effects

  Scenario: Should truncate localtime #21
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('23:59:59.999999')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:00' |
    And no side effects

  Scenario: Should truncate localtime #22
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('23:59:59.999999')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59' |
    And no side effects

  Scenario: Should truncate localtime #23
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('millisecond', localtime('23:59:59.999999')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59.999' |
    And no side effects

  Scenario: Should truncate localtime #24
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('microsecond', localtime('23:59:59.999999')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59.999999' |
    And no side effects

  Scenario: Should truncate localtime #25
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('day', localtime('00:00:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #26
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('00:00:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #27
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('00:00:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #28
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('00:00:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #29
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('millisecond', localtime('00:00:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #30
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('microsecond', localtime('00:00:00')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #31
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('day', localtime('06:15:30.5')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00' |
    And no side effects

  Scenario: Should truncate localtime #32
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('06:15:30.5')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:00:00' |
    And no side effects

  Scenario: Should truncate localtime #33
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('06:15:30.5')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:00' |
    And no side effects

  Scenario: Should truncate localtime #34
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('06:15:30.5')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:30' |
    And no side effects

  Scenario: Should truncate localtime #35
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('millisecond', localtime('06:15:30.5')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:30.5' |
    And no side effects

  Scenario: Should truncate localtime #36
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('microsecond', localtime('06:15:30.5')) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:30.5' |
    And no side effects

  Scenario: Should truncate localtime #37
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('12:31:14.645876'), {second: 30}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:30' |
    And no side effects

  Scenario: Should truncate localtime #38
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('12:31:14.645876'), {minute: 59}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:59:00' |
    And no side effects

  Scenario: Should truncate localtime #39
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('12:31:14.645876'), {millisecond: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.002' |
    And no side effects

  Scenario: Should truncate localtime #40
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('second', localtime('12:31:14.645876'), {microsecond: 42}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.000042' |
    And no side effects

  Scenario: Should truncate localtime #41
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('day', localtime('12:31:14.645876'), {hour: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '05:00:00' |
    And no side effects

  Scenario: Should truncate localtime #42
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', localtime('12:31:14.645876'), {second: 1, millisecond: 1}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:01.001' |
    And no side effects

  Scenario: Should truncate localtime #43
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('hour', localtime('12:31:14.645876'), {minute: 1, second: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:01:02' |
    And no side effects

  Scenario: Should truncate localtime #44
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('microsecond', localtime('12:31:14.645876'), {hour: 1}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '01:31:14.645876' |
    And no side effects
