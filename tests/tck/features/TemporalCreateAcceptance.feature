Feature: TemporalCreateAcceptance

  Scenario: Should construct week datetime #1
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:31:14' |
    And no side effects

  Scenario: Should construct week datetime #2
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:00:00' |
    And no side effects

  Scenario: Should construct week datetime #3
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 3}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T00:00:00' |
    And no side effects

  Scenario: Should construct week datetime #4
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 1, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-05T12:31:14' |
    And no side effects

  Scenario: Should construct week datetime #5
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 1, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-05T12:00:00' |
    And no side effects

  Scenario: Should construct week datetime #6
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-05T00:00:00' |
    And no side effects

  Scenario: Should construct week datetime #7
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2015, week: 1, dayOfWeek: 4, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2015-01-01T12:31:14' |
    And no side effects

  Scenario: Should construct week datetime #8
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2015, week: 1, dayOfWeek: 4, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2015-01-01T12:00:00' |
    And no side effects

  Scenario: Should construct week datetime #9
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2015, week: 1, dayOfWeek: 4}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2015-01-01T00:00:00' |
    And no side effects

  Scenario: Should construct week datetime #10
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, week: 52, dayOfWeek: 7, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-12-31T12:31:14' |
    And no side effects

  Scenario: Should construct week datetime #11
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, week: 52, dayOfWeek: 7, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-12-31T12:00:00' |
    And no side effects

  Scenario: Should construct week datetime #12
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, week: 52, dayOfWeek: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-12-31T00:00:00' |
    And no side effects

  Scenario: Should construct week datetime #13
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2017, week: 1, dayOfWeek: 1, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-02T12:31:14' |
    And no side effects

  Scenario: Should construct week datetime #14
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2017, week: 1, dayOfWeek: 1, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-02T12:00:00' |
    And no side effects

  Scenario: Should construct week datetime #15
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2017, week: 1, dayOfWeek: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-01-02T00:00:00' |
    And no side effects

  Scenario: Should construct week date #13
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, week: 10, dayOfWeek: 3}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07' |
    And no side effects

  Scenario: Should construct week date #14
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, week: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-05' |
    And no side effects

  Scenario: Should construct week date #15
    Given any graph
    When executing query:
      """
      RETURN date({year: 2015, week: 1, dayOfWeek: 4}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2015-01-01' |
    And no side effects

  Scenario: Should construct week localdatetime #13
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:31:14' |
    And no side effects

  Scenario: Should construct week localdatetime #14
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:00:00' |
    And no side effects

  Scenario: Should construct week localdatetime #15
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, week: 10, dayOfWeek: 3}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T00:00:00' |
    And no side effects

  Scenario: Should construct local date time #1
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should construct local date time #2
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, millisecond: 645}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should construct local date time #3
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, microsecond: 645876}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645876' |
    And no side effects

  Scenario: Should construct local date time #10
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00' |
    And no side effects

  Scenario: Should construct local date time #17
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T00:00:00' |
    And no side effects

  Scenario: Should construct local date time #24
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, millisecond: 645, microsecond: 876}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645876' |
    And no side effects

  Scenario: Should construct date time with default time zone #1
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #2
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #3
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #4
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should construct date time with default time zone #5
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, millisecond: 645}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should construct date time with default time zone #6
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, microsecond: 645876}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645876' |
    And no side effects

  Scenario: Should construct date time with default time zone #7
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 3}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #8
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #9
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:31:14' |
    And no side effects

  Scenario: Should construct date time with default time zone #10
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, quarter: 3, dayOfQuarter: 45}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-08-14T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #11
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, quarter: 3, dayOfQuarter: 45, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-08-14T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #12
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, quarter: 3, dayOfQuarter: 45, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-08-14T12:31:14' |
    And no side effects

  Scenario: Should construct date time with default time zone #13
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, ordinalDay: 202}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-20T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #14
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, ordinalDay: 202, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-20T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #15
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, ordinalDay: 202, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-20T12:31:14' |
    And no side effects

  Scenario: Should construct date time with default time zone #16
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #17
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #18
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 12, minute: 31}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #19
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14' |
    And no side effects

  Scenario: Should construct date time with default time zone #20
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 12, minute: 31, second: 14, millisecond: 645}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should construct date time with default time zone #21
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 12, minute: 31, second: 14, microsecond: 645876}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645876' |
    And no side effects

  Scenario: Should construct date time with default time zone #22
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, week: 9, dayOfWeek: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #23
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, week: 9, dayOfWeek: 2, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #24
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, week: 9, dayOfWeek: 2, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14' |
    And no side effects

  Scenario: Should construct date time with default time zone #25
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, quarter: 1, dayOfQuarter: 60}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #26
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, quarter: 1, dayOfQuarter: 60, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #27
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, quarter: 1, dayOfQuarter: 60, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14' |
    And no side effects

  Scenario: Should construct date time with default time zone #28
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, ordinalDay: 60}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T00:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #29
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, ordinalDay: 60, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:00:00' |
    And no side effects

  Scenario: Should construct date time with default time zone #30
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, ordinalDay: 60, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14' |
    And no side effects

  Scenario: Should construct time #1
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 31, second: 14}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14Z' |
    And no side effects

  Scenario: Should construct time #2
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00Z' |
    And no side effects

  Scenario: Should construct time #3
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 31}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00Z' |
    And no side effects

  Scenario: Should construct time #4
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 31, second: 14, millisecond: 645}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645Z' |
    And no side effects

  Scenario: Should construct time #5
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 31, second: 14, microsecond: 645876}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876Z' |
    And no side effects

  Scenario: Should construct time #6
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 31, second: 14, millisecond: 645, microsecond: 876}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876Z' |
    And no side effects

  Scenario: Should construct time #7
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, timezone: '+01:00'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00+01:00' |
    And no side effects

  Scenario: Should construct time #8
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 31, second: 14, timezone: '+01:00'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14+01:00' |
    And no side effects

  Scenario: Should construct time #9
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, timezone: '-08:00'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00-08:00' |
    And no side effects

  Scenario: Should construct time #10
    Given any graph
    When executing query:
      """
      RETURN time({hour: 0}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '00:00:00Z' |
    And no side effects

  Scenario: Should construct time #11
    Given any graph
    When executing query:
      """
      RETURN time({hour: 23, minute: 59, second: 59, millisecond: 999, microsecond: 999}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59.999999Z' |
    And no side effects

  Scenario: Should construct time #12
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 31, second: 14, microsecond: 645876, timezone: '+05:45'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876+05:45' |
    And no side effects

  Scenario: Should construct time #13
    Given any graph
    When executing query:
      """
      RETURN time({hour: 6, second: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:00:05Z' |
    And no side effects

  Scenario: Should construct time #14
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, minute: 0, second: 0, timezone: 'Z'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00Z' |
    And no side effects

  Scenario: Should construct local time #1
    Given any graph
    When executing query:
      """
      RETURN localtime({hour: 12, minute: 31, second: 14}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14' |
    And no side effects

  Scenario: Should construct local time #2
    Given any graph
    When executing query:
      """
      RETURN localtime({hour: 12}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00' |
    And no side effects

  Scenario: Should construct local time #3
    Given any graph
    When executing query:
      """
      RETURN localtime({hour: 12, minute: 31}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:00' |
    And no side effects

  Scenario: Should construct local time #4
    Given any graph
    When executing query:
      """
      RETURN localtime({hour: 12, minute: 31, second: 14, millisecond: 645}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should construct local time #5
    Given any graph
    When executing query:
      """
      RETURN localtime({hour: 12, minute: 31, second: 14, microsecond: 645876}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876' |
    And no side effects

  Scenario: Should construct local time #6
    Given any graph
    When executing query:
      """
      RETURN localtime({hour: 12, minute: 31, second: 14, millisecond: 645, microsecond: 876}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645876' |
    And no side effects

  Scenario: Should construct local time #7
    Given any graph
    When executing query:
      """
      RETURN localtime({hour: 23, minute: 59, second: 59, millisecond: 999, microsecond: 999}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '23:59:59.999999' |
    And no side effects

  Scenario: Should construct temporal with time offset with second precision #1
    Given any graph
    When executing query:
      """
      RETURN time('12:31:14+01:00:30') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14+01:00:30' |
    And no side effects

  Scenario: Should construct temporal with time offset with second precision #2
    Given any graph
    When executing query:
      """
      RETURN time({hour: 12, timezone: '+01:00:30'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00+01:00:30' |
    And no side effects

  Scenario: Should construct temporal with time offset with second precision #3
    Given any graph
    When executing query:
      """
      RETURN time('06:15:30.5+01:00:30') AS t
      """
    Then the result should be, in any order:
      | t |
      | '06:15:30.5+01:00:30' |
    And no side effects

  Scenario: Should construct temporal with time offset with second precision #4
    Given any graph
    When executing query:
      """
      RETURN time('12:31:14-00:00:30') AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14-00:00:30' |
    And no side effects

  Scenario: Should construct date time from epoch
    Given any graph
    When executing query:
      """
      RETURN datetime({epochSeconds: 416779254}) AS a, datetime({epochMillis: 416779254645}) AS b
      """
    Then the result should be, in any order:
      | a | b |
      | '1983-03-17T20:00:54' | '1983-03-17T20:00:54.645000' |
    And no side effects

  Scenario: Should construct date #1
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, month: 10, day: 11}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should construct date #2
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, month: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01' |
    And no side effects

  Scenario: Should construct date #3
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-01' |
    And no side effects

  Scenario: Should construct quarter date #1
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, quarter: 3, dayOfQuarter: 45}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-08-14' |
    And no side effects

  Scenario: Should construct quarter date #2
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, quarter: 3}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-01' |
    And no side effects

  Scenario: Should construct ordinal date #1
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, ordinalDay: 202}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-20' |
    And no side effects

  Scenario: Should construct ordinal date #2
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, ordinalDay: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-01' |
    And no side effects

  Scenario: Should construct duration #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration({years: 1, months: 2, days: 3, hours: 4, minutes: 5, seconds: 6})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y2M3DT4H5M6S' |
    And no side effects

  Scenario: Should construct duration #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration({months: 5})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P5M' |
    And no side effects

  Scenario: Should construct duration #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration({weeks: 2})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P14D' |
    And no side effects

  Scenario: Should construct duration #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration({days: 14, hours: 16, minutes: 12})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P14DT16H12M' |
    And no side effects

  Scenario: Should construct duration #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration({minutes: 90})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H30M' |
    And no side effects

  Scenario: Should construct duration #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration({seconds: 3661})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H1M1S' |
    And no side effects

  Scenario: Should construct duration #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration({milliseconds: 1500})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1.5S' |
    And no side effects

  Scenario: Should construct duration #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration({microseconds: 1500000})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1.5S' |
    And no side effects

  Scenario: Should construct duration #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration({days: 1.5})) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1DT12H' |
    And no side effects

  Scenario: Should propagate null #2
    Given any graph
    When executing query:
      """
      RETURN date(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #3
    Given any graph
    When executing query:
      """
      RETURN localdatetime(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #4
    Given any graph
    When executing query:
      """
      RETURN datetime(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #5
    Given any graph
    When executing query:
      """
      RETURN time(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #6
    Given any graph
    When executing query:
      """
      RETURN localtime(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #7
    Given any graph
    When executing query:
      """
      RETURN duration(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #8
    Given any graph
    When executing query:
      """
      RETURN date.truncate('year', null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #9
    Given any graph
    When executing query:
      """
      RETURN localdatetime.truncate('day', null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #10
    Given any graph
    When executing query:
      """
      RETURN datetime.truncate('day', null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #11
    Given any graph
    When executing query:
      """
      RETURN time.truncate('minute', null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #12
    Given any graph
    When executing query:
      """
      RETURN localtime.truncate('minute', null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #14
    Given any graph
    When executing query:
      """
      RETURN date({date: null}) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #15
    Given any graph
    When executing query:
      """
      RETURN localdatetime({datetime: null}) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #16
    Given any graph
    When executing query:
      """
      RETURN time({time: null}) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #17
    Given any graph
    When executing query:
      """
      RETURN localtime({time: null}) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #18
    Given any graph
    When executing query:
      """
      RETURN datetime({date: null}) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #19
    Given any graph
    When executing query:
      """
      RETURN toString(time(null)) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #20
    Given any graph
    When executing query:
      """
      RETURN toString(duration(null)) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should construct date time with named time zone #1
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: 'Europe/Stockholm'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14+01:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should construct date time with named time zone #2
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: 'Europe/Stockholm'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00+02:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should construct date time with named time zone #3
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: 'Europe/Stockholm'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59+01:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should construct date time with named time zone #4
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: 'Europe/Stockholm'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00+01:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should construct date time with named time zone #5
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1969, month: 12, day: 31, hour: 23, minute: 59, second: 59, timezone: 'Europe/Stockholm'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-12-31T23:59:59+01:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should construct date time with named time zone #6
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: 'America/New_York'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14-04:00[America/New_York]' |
    And no side effects

  Scenario: Should construct date time with named time zone #7
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: 'America/New_York'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00-04:00[America/New_York]' |
    And no side effects

  Scenario: Should construct date time with named time zone #8
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: 'America/New_York'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59-05:00[America/New_York]' |
    And no side effects

  Scenario: Should construct date time with named time zone #9
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: 'America/New_York'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00-05:00[America/New_York]' |
    And no side effects

  Scenario: Should construct date time with named time zone #10
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1969, month: 12, day: 31, hour: 23, minute: 59, second: 59, timezone: 'America/New_York'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-12-31T23:59:59-05:00[America/New_York]' |
    And no side effects

  Scenario: Should construct date time with named time zone #11
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: 'Asia/Tokyo'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14+09:00[Asia/Tokyo]' |
    And no side effects

  Scenario: Should construct date time with named time zone #12
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: 'Asia/Tokyo'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00+09:00[Asia/Tokyo]' |
    And no side effects

  Scenario: Should construct date time with named time zone #13
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: 'Asia/Tokyo'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59+09:00[Asia/Tokyo]' |
    And no side effects

  Scenario: Should construct date time with named time zone #14
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: 'Asia/Tokyo'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00+09:00[Asia/Tokyo]' |
    And no side effects

  Scenario: Should construct date time with named time zone #15
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1969, month: 12, day: 31, hour: 23, minute: 59, second: 59, timezone: 'Asia/Tokyo'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-12-31T23:59:59+09:00[Asia/Tokyo]' |
    And no side effects

  Scenario: Should construct date time with named time zone #16
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: 'Europe/London'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14+01:00[Europe/London]' |
    And no side effects

  Scenario: Should construct date time with named time zone #17
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: 'Europe/London'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00+01:00[Europe/London]' |
    And no side effects

  Scenario: Should construct date time with named time zone #18
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: 'Europe/London'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59Z[Europe/London]' |
    And no side effects

  Scenario: Should construct date time with named time zone #19
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: 'Europe/London'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00Z[Europe/London]' |
    And no side effects

  Scenario: Should construct date time with named time zone #20
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1969, month: 12, day: 31, hour: 23, minute: 59, second: 59, timezone: 'Europe/London'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-12-31T23:59:59+01:00[Europe/London]' |
    And no side effects

  Scenario: Should construct date time with named time zone #21
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: 'Pacific/Auckland'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14+12:00[Pacific/Auckland]' |
    And no side effects

  Scenario: Should construct date time with named time zone #22
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: 'Pacific/Auckland'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00+12:00[Pacific/Auckland]' |
    And no side effects

  Scenario: Should construct date time with named time zone #23
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: 'Pacific/Auckland'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59+13:00[Pacific/Auckland]' |
    And no side effects

  Scenario: Should construct date time with named time zone #24
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: 'Pacific/Auckland'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00+13:00[Pacific/Auckland]' |
    And no side effects

  Scenario: Should construct date time with named time zone #25
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1969, month: 12, day: 31, hour: 23, minute: 59, second: 59, timezone: 'Pacific/Auckland'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1969-12-31T23:59:59+12:00[Pacific/Auckland]' |
    And no side effects

  Scenario: Should construct date time with named time zone #26
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 0, timezone: 'Asia/Kathmandu'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:00+05:30[Asia/Kathmandu]' |
    And no side effects

  Scenario: Should construct date time with named time zone #27
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 6, day: 1, hour: 6, minute: 0, second: 0, timezone: 'America/St_Johns'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-06-01T06:00:00-02:30[America/St_Johns]' |
    And no side effects

  Scenario: Should construct date time with named time zone #28
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1999, month: 12, day: 31, hour: 23, minute: 59, second: 59, timezone: 'Africa/Nairobi'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1999-12-31T23:59:59+03:00[Africa/Nairobi]' |
    And no side effects

  Scenario: Should construct date time with named time zone #29
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2010, month: 5, day: 5, hour: 5, minute: 5, second: 5, timezone: 'Australia/Eucla'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2010-05-05T05:05:05+08:45[Australia/Eucla]' |
    And no side effects

  Scenario: Should construct date time with offset time zone #1
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: '+01:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14+01:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #2
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: '+01:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00+01:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #3
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: '+01:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59+01:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #4
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: '+01:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00+01:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #5
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: '-05:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14-05:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #6
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: '-05:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00-05:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #7
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: '-05:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59-05:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #8
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: '-05:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00-05:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #9
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: '+05:45'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14+05:45' |
    And no side effects

  Scenario: Should construct date time with offset time zone #10
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: '+05:45'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00+05:45' |
    And no side effects

  Scenario: Should construct date time with offset time zone #11
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: '+05:45'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59+05:45' |
    And no side effects

  Scenario: Should construct date time with offset time zone #12
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: '+05:45'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00+05:45' |
    And no side effects

  Scenario: Should construct date time with offset time zone #13
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: '-08:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14-08:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #14
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: '-08:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00-08:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #15
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: '-08:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59-08:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #16
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: '-08:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00-08:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #17
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: 'Z'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14Z' |
    And no side effects

  Scenario: Should construct date time with offset time zone #18
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: 'Z'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00Z' |
    And no side effects

  Scenario: Should construct date time with offset time zone #19
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: 'Z'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59Z' |
    And no side effects

  Scenario: Should construct date time with offset time zone #20
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: 'Z'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00Z' |
    And no side effects

  Scenario: Should construct date time with offset time zone #21
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, timezone: '+14:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14+14:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #22
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 7, day: 11, hour: 12, minute: 0, second: 0, timezone: '+14:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-07-11T12:00:00+14:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #23
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2000, month: 2, day: 29, hour: 23, minute: 59, second: 59, timezone: '+14:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59+14:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #24
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 2024, month: 1, day: 1, timezone: '+14:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:00:00+14:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #25
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 0, second: 0, timezone: '-00:30'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00-00:30' |
    And no side effects

  Scenario: Should construct date time with offset time zone #26
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 0, second: 0, timezone: '+09:30'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00+09:30' |
    And no side effects

  Scenario: Should construct date time with offset time zone #27
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 0, second: 0, timezone: '+00:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00Z' |
    And no side effects

  Scenario: Should construct date time with offset time zone #28
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 0, second: 0, timezone: '-11:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00-11:00' |
    And no side effects

  Scenario: Should construct date time with offset time zone #29
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, minute: 0, second: 0, timezone: '+12:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00+12:00' |
    And no side effects

  Scenario: Should store date
    Given an empty graph
    When executing query:
      """
      CREATE (p:Primitive)
      SET p.v = date("1984-10-11")
      RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should store date #1
    Given an empty graph
    And having executed:
      """
      CREATE ({v: date("1984-10-11")})
      """
    When executing query:
      """
      MATCH (n)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11' |
    And no side effects

  Scenario: Should store date #2
    Given an empty graph
    When executing query:
      """
      CREATE (n {v: date("1984-10-11")})
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store date #3
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {k: 1})
      ON CREATE SET p.v = date("2015-06-24")
      RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '2015-06-24' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 2 |

  Scenario: Should store date array #1
    Given an empty graph
    When executing query:
      """
      CREATE (n {vs: [date("1984-10-11"), date("1985-02-01")]})
      RETURN n.vs AS vs
      """
    Then the result should be, in any order:
      | vs |
      | ['1984-10-11', '1985-02-01'] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store date array #2
    Given an empty graph
    And having executed:
      """
      CREATE ({vs: [date("1984-10-11"), date("1985-02-01")]})
      """
    When executing query:
      """
      MATCH (n)
      RETURN n.vs[0] AS first, size(n.vs) AS len
      """
    Then the result should be, in any order:
      | first | len |
      | '1984-10-11'  | 2   |
    And no side effects

  Scenario: Should store date time
    Given an empty graph
    When executing query:
      """
      CREATE (p:Primitive)
      SET p.v = datetime("1984-10-11T12:31:14+01:00")
      RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11T12:31:14+01:00' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should store date time #1
    Given an empty graph
    And having executed:
      """
      CREATE ({v: datetime("1984-10-11T12:31:14+01:00")})
      """
    When executing query:
      """
      MATCH (n)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11T12:31:14+01:00' |
    And no side effects

  Scenario: Should store date time #2
    Given an empty graph
    When executing query:
      """
      CREATE (n {v: datetime("1984-10-11T12:31:14+01:00")})
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11T12:31:14+01:00' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store date time #3
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {k: 1})
      ON CREATE SET p.v = datetime("2015-06-24T12:16:48+02:00[Europe/Stockholm]")
      RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | '2015-06-24T12:16:48+02:00[Europe/Stockholm]' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 2 |

  Scenario: Should store date time array #1
    Given an empty graph
    When executing query:
      """
      CREATE (n {vs: [datetime("1984-10-11T12:31:14Z"), datetime("1984-10-11T12:31:14+01:00")]})
      RETURN n.vs AS vs
      """
    Then the result should be, in any order:
      | vs |
      | ['1984-10-11T12:31:14Z', '1984-10-11T12:31:14+01:00'] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store date time array #2
    Given an empty graph
    And having executed:
      """
      CREATE ({vs: [datetime("1984-10-11T12:31:14Z"), datetime("1984-10-11T12:31:14+01:00")]})
      """
    When executing query:
      """
      MATCH (n)
      RETURN n.vs[0] AS first, size(n.vs) AS len
      """
    Then the result should be, in any order:
      | first | len |
      | '1984-10-11T12:31:14Z'  | 2   |
    And no side effects

  Scenario: Should store duration
    Given an empty graph
    When executing query:
      """
      CREATE (p:Primitive)
      SET p.v = duration({days: 14, hours: 16, minutes: 12})
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | 'P14DT16H12M' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should store duration #1
    Given an empty graph
    And having executed:
      """
      CREATE ({v: duration({days: 14, hours: 16, minutes: 12})})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | 'P14DT16H12M' |
    And no side effects

  Scenario: Should store duration #2
    Given an empty graph
    When executing query:
      """
      CREATE (n {v: duration({days: 14, hours: 16, minutes: 12})})
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | 'P14DT16H12M' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store duration #3
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {k: 1})
      ON CREATE SET p.v = duration({months: 12, days: -14, hours: 16})
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | 'P1Y-14DT16H' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 2 |

  Scenario: Should store duration array #1
    Given an empty graph
    When executing query:
      """
      CREATE (n {vs: [duration({days: 14}), duration({hours: 16, minutes: 12})]})
      RETURN [x IN n.vs | toString(x)] AS vs
      """
    Then the result should be, in any order:
      | vs |
      | ['P14D', 'PT16H12M'] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store duration array #2
    Given an empty graph
    And having executed:
      """
      CREATE ({vs: [duration({days: 14}), duration({hours: 16, minutes: 12})]})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.vs[0]) AS first, size(n.vs) AS len
      """
    Then the result should be, in any order:
      | first | len |
      | 'P14D'  | 2   |
    And no side effects

  Scenario: Should store local date time
    Given an empty graph
    When executing query:
      """
      CREATE (p:Primitive)
      SET p.v = localdatetime("1984-10-11T12:31:14")
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11T12:31:14' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should store local date time #1
    Given an empty graph
    And having executed:
      """
      CREATE ({v: localdatetime("1984-10-11T12:31:14")})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11T12:31:14' |
    And no side effects

  Scenario: Should store local date time #2
    Given an empty graph
    When executing query:
      """
      CREATE (n {v: localdatetime("1984-10-11T12:31:14")})
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '1984-10-11T12:31:14' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store local date time #3
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {k: 1})
      ON CREATE SET p.v = localdatetime("2015-06-24T12:16:48")
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '2015-06-24T12:16:48' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 2 |

  Scenario: Should store local date time array #1
    Given an empty graph
    When executing query:
      """
      CREATE (n {vs: [localdatetime("1984-10-11T12:31:14"), localdatetime("1985-02-01T06:00:00")]})
      RETURN [x IN n.vs | toString(x)] AS vs
      """
    Then the result should be, in any order:
      | vs |
      | ['1984-10-11T12:31:14', '1985-02-01T06:00:00'] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store local date time array #2
    Given an empty graph
    And having executed:
      """
      CREATE ({vs: [localdatetime("1984-10-11T12:31:14"), localdatetime("1985-02-01T06:00:00")]})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.vs[0]) AS first, size(n.vs) AS len
      """
    Then the result should be, in any order:
      | first | len |
      | '1984-10-11T12:31:14'  | 2   |
    And no side effects

  Scenario: Should store local time
    Given an empty graph
    When executing query:
      """
      CREATE (p:Primitive)
      SET p.v = localtime("12:31:14")
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should store local time #1
    Given an empty graph
    And having executed:
      """
      CREATE ({v: localtime("12:31:14")})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14' |
    And no side effects

  Scenario: Should store local time #2
    Given an empty graph
    When executing query:
      """
      CREATE (n {v: localtime("12:31:14")})
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store local time #3
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {k: 1})
      ON CREATE SET p.v = localtime("12:31:14.645")
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14.645' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 2 |

  Scenario: Should store local time array #1
    Given an empty graph
    When executing query:
      """
      CREATE (n {vs: [localtime("12:31:14"), localtime("06:00:00")]})
      RETURN [x IN n.vs | toString(x)] AS vs
      """
    Then the result should be, in any order:
      | vs |
      | ['12:31:14', '06:00:00'] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store local time array #2
    Given an empty graph
    And having executed:
      """
      CREATE ({vs: [localtime("12:31:14"), localtime("06:00:00")]})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.vs[0]) AS first, size(n.vs) AS len
      """
    Then the result should be, in any order:
      | first | len |
      | '12:31:14'  | 2   |
    And no side effects

  Scenario: Should store time
    Given an empty graph
    When executing query:
      """
      CREATE (p:Primitive)
      SET p.v = time("12:31:14+01:00")
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14+01:00' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should store time #1
    Given an empty graph
    And having executed:
      """
      CREATE ({v: time("12:31:14+01:00")})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14+01:00' |
    And no side effects

  Scenario: Should store time #2
    Given an empty graph
    When executing query:
      """
      CREATE (n {v: time("12:31:14+01:00")})
      RETURN toString(n.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14+01:00' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store time #3
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {k: 1})
      ON CREATE SET p.v = time("12:31:14.645+01:00")
      RETURN toString(p.v) AS v
      """
    Then the result should be, in any order:
      | v |
      | '12:31:14.645+01:00' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 2 |

  Scenario: Should store time array #1
    Given an empty graph
    When executing query:
      """
      CREATE (n {vs: [time("12:31:14Z"), time("06:00:00+01:00")]})
      RETURN [x IN n.vs | toString(x)] AS vs
      """
    Then the result should be, in any order:
      | vs |
      | ['12:31:14Z', '06:00:00+01:00'] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Should store time array #2
    Given an empty graph
    And having executed:
      """
      CREATE ({vs: [time("12:31:14Z"), time("06:00:00+01:00")]})
      """
    When executing query:
      """
      MATCH (n)
      RETURN toString(n.vs[0]) AS first, size(n.vs) AS len
      """
    Then the result should be, in any order:
      | first | len |
      | '12:31:14Z'  | 2   |
    And no side effects
