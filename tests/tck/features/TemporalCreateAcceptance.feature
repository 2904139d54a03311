Feature: TemporalCreateAcceptance

  Scenario: Should construct week date #1
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, week: 10, dayOfWeek: 3}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07' |
    And no side effects

  Scenario: Should construct week date #2
    Given any graph
    When executing query:
      """
      RETURN date({year: 1984, week: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-05' |
    And no side effects

  Scenario: Should construct week date #3
    Given any graph
    When executing query:
      """
      RETURN date({year: 2015, week: 1, dayOfWeek: 4}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2015-01-01' |
    And no side effects

  Scenario: Should construct week localdatetime #1
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12, minute: 31, second: 14}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:31:14' |
    And no side effects

  Scenario: Should construct week localdatetime #2
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, week: 10, dayOfWeek: 3, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-03-07T12:00:00' |
    And no side effects

  Scenario: Should construct week localdatetime #3
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

  Scenario: Should construct local date time #4
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00' |
    And no side effects

  Scenario: Should construct local date time #5
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T00:00:00' |
    And no side effects

  Scenario: Should construct local date time #6
    Given any graph
    When executing query:
      """
      RETURN localdatetime({year: 1984, month: 10, day: 11, hour: 12, minute: 31, second: 14, millisecond: 645, microsecond: 876}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645876' |
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

  Scenario: Should propagate null #1
    Given any graph
    When executing query:
      """
      RETURN date(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #2
    Given any graph
    When executing query:
      """
      RETURN localdatetime(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #3
    Given any graph
    When executing query:
      """
      RETURN datetime(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
    And no side effects

  Scenario: Should propagate null #4
    Given any graph
    When executing query:
      """
      RETURN duration(null) IS NULL AS n
      """
    Then the result should be, in any order:
      | n |
      | true |
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

  Scenario: Should construct date time with named time zone #1
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, timezone: 'Europe/Stockholm'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00+01:00[Europe/Stockholm]' |
    And no side effects

  Scenario: Should construct date time with offset time zone #1
    Given any graph
    When executing query:
      """
      RETURN datetime({year: 1984, month: 10, day: 11, hour: 12, timezone: '+01:00'}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00+01:00' |
    And no side effects
