Feature: TemporalSelectAcceptance

  Scenario: Should select date #1
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should select date #2
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, day: 28}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-28' |
    And no side effects

  Scenario: Should select date #3
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-10-11' |
    And no side effects

  Scenario: Should select date #4
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, month: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-05-11' |
    And no side effects

  Scenario: Should select date #5
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, year: 2000, month: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-11' |
    And no side effects

  Scenario: Should select date #6
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, day: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01' |
    And no side effects

  Scenario: Should select date #7
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, year: 1990, month: 12, day: 24}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-12-24' |
    And no side effects

  Scenario: Should select date #8
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN date({datetime: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should select date #9
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN date({datetime: dd, day: 28}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-28' |
    And no side effects

  Scenario: Should select date #10
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN date({datetime: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-10-11' |
    And no side effects

  Scenario: Should select date #11
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN date({datetime: dd, month: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-05-11' |
    And no side effects

  Scenario: Should select date #12
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN date({datetime: dd, year: 2000, month: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-11' |
    And no side effects

  Scenario: Should select date #13
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN date({datetime: dd, day: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-01' |
    And no side effects

  Scenario: Should select date #14
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN date({datetime: dd, year: 1990, month: 12, day: 24}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-12-24' |
    And no side effects

  Scenario: Should select date #15
    Given any graph
    When executing query:
      """
      WITH datetime('2017-03-05T06:07:08') AS dd RETURN date({datetime: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05' |
    And no side effects

  Scenario: Should select date #16
    Given any graph
    When executing query:
      """
      WITH datetime('2017-03-05T06:07:08') AS dd RETURN date({datetime: dd, day: 28}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-28' |
    And no side effects

  Scenario: Should select date #17
    Given any graph
    When executing query:
      """
      WITH datetime('2017-03-05T06:07:08') AS dd RETURN date({datetime: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-03-05' |
    And no side effects

  Scenario: Should select date #18
    Given any graph
    When executing query:
      """
      WITH datetime('2017-03-05T06:07:08') AS dd RETURN date({datetime: dd, month: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-05-05' |
    And no side effects

  Scenario: Should select date #19
    Given any graph
    When executing query:
      """
      WITH datetime('2017-03-05T06:07:08') AS dd RETURN date({datetime: dd, year: 2000, month: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-05' |
    And no side effects

  Scenario: Should select date #20
    Given any graph
    When executing query:
      """
      WITH datetime('2017-03-05T06:07:08') AS dd RETURN date({datetime: dd, day: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-01' |
    And no side effects

  Scenario: Should select date #21
    Given any graph
    When executing query:
      """
      WITH datetime('2017-03-05T06:07:08') AS dd RETURN date({datetime: dd, year: 1990, month: 12, day: 24}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-12-24' |
    And no side effects

  Scenario: Should select date into date time #1
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN datetime({date: dd, hour: 10, minute: 10, second: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T10:10:10' |
    And no side effects

  Scenario: Should select date into date time #2
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN datetime({date: dd, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:00' |
    And no side effects

  Scenario: Should select date into date time #3
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN datetime({date: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T00:00:00' |
    And no side effects

  Scenario: Should select date into date time #4
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN datetime({date: dd, hour: 23, minute: 59, second: 59, millisecond: 999}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T23:59:59.999000' |
    And no side effects

  Scenario: Should select date into date time #5
    Given any graph
    When executing query:
      """
      WITH date('2000-02-29') AS dd RETURN datetime({date: dd, hour: 10, minute: 10, second: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T10:10:10' |
    And no side effects

  Scenario: Should select date into date time #6
    Given any graph
    When executing query:
      """
      WITH date('2000-02-29') AS dd RETURN datetime({date: dd, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:00:00' |
    And no side effects

  Scenario: Should select date into date time #7
    Given any graph
    When executing query:
      """
      WITH date('2000-02-29') AS dd RETURN datetime({date: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T00:00:00' |
    And no side effects

  Scenario: Should select date into date time #8
    Given any graph
    When executing query:
      """
      WITH date('2000-02-29') AS dd RETURN datetime({date: dd, hour: 23, minute: 59, second: 59, millisecond: 999}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T23:59:59.999000' |
    And no side effects

  Scenario: Should select date into date time #9
    Given any graph
    When executing query:
      """
      WITH date('2017-03-05') AS dd RETURN datetime({date: dd, hour: 10, minute: 10, second: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T10:10:10' |
    And no side effects

  Scenario: Should select date into date time #10
    Given any graph
    When executing query:
      """
      WITH date('2017-03-05') AS dd RETURN datetime({date: dd, hour: 12}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:00:00' |
    And no side effects

  Scenario: Should select date into date time #11
    Given any graph
    When executing query:
      """
      WITH date('2017-03-05') AS dd RETURN datetime({date: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T00:00:00' |
    And no side effects

  Scenario: Should select date into date time #12
    Given any graph
    When executing query:
      """
      WITH date('2017-03-05') AS dd RETURN datetime({date: dd, hour: 23, minute: 59, second: 59, millisecond: 999}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T23:59:59.999000' |
    And no side effects

  Scenario: Should select date into local date time #1
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN localdatetime({date: dd, hour: 10, minute: 10, second: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T10:10:10' |
    And no side effects

  Scenario: Should select date into local date time #2
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN localdatetime({date: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T00:00:00' |
    And no side effects

  Scenario: Should select date into local date time #3
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN localdatetime({date: dd, day: 28, hour: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-28T10:00:00' |
    And no side effects

  Scenario: Should select date into local date time #4
    Given any graph
    When executing query:
      """
      WITH date('1990-06-15') AS dd RETURN localdatetime({date: dd, hour: 10, minute: 10, second: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-06-15T10:10:10' |
    And no side effects

  Scenario: Should select date into local date time #5
    Given any graph
    When executing query:
      """
      WITH date('1990-06-15') AS dd RETURN localdatetime({date: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-06-15T00:00:00' |
    And no side effects

  Scenario: Should select date into local date time #6
    Given any graph
    When executing query:
      """
      WITH date('1990-06-15') AS dd RETURN localdatetime({date: dd, day: 28, hour: 10}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-06-28T10:00:00' |
    And no side effects

  Scenario: Should select datetime into local date time #1
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN localdatetime({datetime: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select datetime into local date time #2
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN localdatetime({datetime: dd, minute: 0}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:14.645000' |
    And no side effects

  Scenario: Should select datetime into local date time #3
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN localdatetime({datetime: dd, day: 28, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-28T12:31:42' |
    And no side effects

  Scenario: Should select datetime into local date time #4
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN localdatetime({datetime: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select datetime into local date time #5
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN localdatetime({datetime: dd, hour: 6}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T06:31:14.645000' |
    And no side effects

  Scenario: Should select datetime into local date time #6
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645000') AS dd RETURN localdatetime({datetime: dd, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.002000' |
    And no side effects

  Scenario: Should datetime into date time #1
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should datetime into date time #2
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, minute: 0}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:14.645000' |
    And no side effects

  Scenario: Should datetime into date time #3
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, day: 28, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-28T12:31:42' |
    And no side effects

  Scenario: Should datetime into date time #4
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should datetime into date time #5
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, hour: 6}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T06:31:14.645000' |
    And no side effects

  Scenario: Should datetime into date time #6
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.002000' |
    And no side effects

  Scenario: Should datetime into date time #7
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, month: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-01-11T12:31:14.645000' |
    And no side effects

  Scenario: Should datetime into date time #8
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, second: 3, microsecond: 4}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:03.000004' |
    And no side effects

  Scenario: Should datetime into date time #9
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, year: 2001, hour: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2001-10-11T01:31:14.645000' |
    And no side effects

  Scenario: Should datetime into date time #10
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645000') AS dd RETURN datetime({datetime: dd, minute: 59}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:59:14.645000' |
    And no side effects

  Scenario: Should select time #1
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN time({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645+01:00' |
    And no side effects

  Scenario: Should select time #2
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN time({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645+01:00' |
    And no side effects

  Scenario: Should select time #3
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN time({time: tt, second: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02+01:00' |
    And no side effects

  Scenario: Should select time #4
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN time({time: tt, hour: 1}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '01:31:14.645+01:00' |
    And no side effects

  Scenario: Should select time #5
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN time({time: tt, microsecond: 7}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.000007+01:00' |
    And no side effects

  Scenario: Should select time #6
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN time({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645Z' |
    And no side effects

  Scenario: Should select time #7
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN time({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645Z' |
    And no side effects

  Scenario: Should select time #8
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN time({time: tt, second: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02Z' |
    And no side effects

  Scenario: Should select time #9
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN time({time: tt, hour: 1}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '01:31:14.645Z' |
    And no side effects

  Scenario: Should select time #10
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN time({time: tt, timezone: '+01:00'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645+01:00' |
    And no side effects

  Scenario: Should select time #11
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645Z' |
    And no side effects

  Scenario: Should select time #12
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645Z' |
    And no side effects

  Scenario: Should select time #13
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, second: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02Z' |
    And no side effects

  Scenario: Should select time #14
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, hour: 1}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '01:31:14.645Z' |
    And no side effects

  Scenario: Should select time #15
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, timezone: '+01:00'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645+01:00' |
    And no side effects

  Scenario: Should select time #16
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645Z' |
    And no side effects

  Scenario: Should select time #17
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645Z' |
    And no side effects

  Scenario: Should select time #18
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, second: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02Z' |
    And no side effects

  Scenario: Should select time #19
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, hour: 1}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '01:31:14.645Z' |
    And no side effects

  Scenario: Should select time #20
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN time({time: tt, timezone: '+01:00'}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645+01:00' |
    And no side effects

  Scenario: Should select local time #1
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN localtime({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should select local time #2
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN localtime({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645' |
    And no side effects

  Scenario: Should select local time #3
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645+01:00') AS tt RETURN localtime({time: tt, second: 2, millisecond: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02.002' |
    And no side effects

  Scenario: Should select local time #4
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN localtime({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should select local time #5
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN localtime({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645' |
    And no side effects

  Scenario: Should select local time #6
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN localtime({time: tt, second: 2, millisecond: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02.002' |
    And no side effects

  Scenario: Should select local time #7
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN localtime({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should select local time #8
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN localtime({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645' |
    And no side effects

  Scenario: Should select local time #9
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS tt RETURN localtime({time: tt, second: 2, millisecond: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02.002' |
    And no side effects

  Scenario: Should select local time #10
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN localtime({time: tt}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:14.645' |
    And no side effects

  Scenario: Should select local time #11
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN localtime({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:14.645' |
    And no side effects

  Scenario: Should select local time #12
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645') AS tt RETURN localtime({time: tt, second: 2, millisecond: 2}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:31:02.002' |
    And no side effects

  Scenario: Should select time into date time #1
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select time into date time #2
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select time into date time #3
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 2000, month: 2, day: 29, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select time into date time #4
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 2017, month: 3, day: 5, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select time into date time #5
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt, minute: 0}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:14.645000' |
    And no side effects

  Scenario: Should select time into date time #6
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 1999, month: 12, day: 31, time: tt, microsecond: 123}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1999-12-31T12:31:14.000123' |
    And no side effects

  Scenario: Should select time into date time #7
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 2024, month: 1, day: 1, time: tt, hour: 0}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:31:14.645000' |
    And no side effects

  Scenario: Should select time into date time #8
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt, second: 1, millisecond: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:01.001000' |
    And no side effects

  Scenario: Should select time into date time #9
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select time into date time #10
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select time into date time #11
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 2000, month: 2, day: 29, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select time into date time #12
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 2017, month: 3, day: 5, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select time into date time #13
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt, minute: 0}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:14.645000' |
    And no side effects

  Scenario: Should select time into date time #14
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 1999, month: 12, day: 31, time: tt, microsecond: 123}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1999-12-31T12:31:14.000123' |
    And no side effects

  Scenario: Should select time into date time #15
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 2024, month: 1, day: 1, time: tt, hour: 0}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2024-01-01T00:31:14.645000' |
    And no side effects

  Scenario: Should select time into date time #16
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN datetime({year: 1984, month: 10, day: 11, time: tt, second: 1, millisecond: 1}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:01.001000' |
    And no side effects

  Scenario: Should select time into local date time #1
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN localdatetime({year: 1984, month: 10, day: 11, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select time into local date time #2
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN localdatetime({year: 1984, month: 10, day: 11, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select time into local date time #3
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN localdatetime({year: 2000, month: 2, day: 29, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select time into local date time #4
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645Z') AS tt RETURN localdatetime({year: 2017, month: 3, day: 5, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select time into local date time #5
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN localdatetime({year: 1984, month: 10, day: 11, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select time into local date time #6
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN localdatetime({year: 1984, month: 10, day: 11, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select time into local date time #7
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN localdatetime({year: 2000, month: 2, day: 29, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select time into local date time #8
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645') AS tt RETURN localdatetime({year: 2017, month: 3, day: 5, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #1
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #2
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #3
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({date: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #4
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({date: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #5
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #6
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #7
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #8
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #9
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #10
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #11
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #12
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #13
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #14
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #15
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #16
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({date: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #17
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #18
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #19
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({localdatetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #20
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({localdatetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #21
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #22
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #23
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #24
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #25
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #26
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #27
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #28
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #29
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #30
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #31
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #32
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({localdatetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #33
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #34
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #35
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({datetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #36
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, time('12:31:14.645Z') AS tt RETURN datetime({datetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #37
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #38
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #39
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #40
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localtime('12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #41
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #42
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #43
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #44
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #45
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into date time #46
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects

  Scenario: Should select date and time into date time #47
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, millisecond: 2}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.002000' |
    And no side effects

  Scenario: Should select date and time into date time #48
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN datetime({datetime: dd, time: tt, hour: 6, minute: 7}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T06:07:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #1
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, time('12:31:14.645Z') AS tt RETURN localdatetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #2
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, time('12:31:14.645Z') AS tt RETURN localdatetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #3
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localtime('12:31:14.645') AS tt RETURN localdatetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #4
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localtime('12:31:14.645') AS tt RETURN localdatetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #5
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #6
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #7
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({date: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #8
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({date: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #9
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, time('12:31:14.645Z') AS tt RETURN localdatetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #10
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, time('12:31:14.645Z') AS tt RETURN localdatetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #11
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localtime('12:31:14.645') AS tt RETURN localdatetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #12
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localtime('12:31:14.645') AS tt RETURN localdatetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #13
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #14
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #15
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({localdatetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #16
    Given any graph
    When executing query:
      """
      WITH localdatetime('2017-03-05T23:00:00') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({localdatetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2017-03-05T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #17
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, time('12:31:14.645Z') AS tt RETURN localdatetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #18
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, time('12:31:14.645Z') AS tt RETURN localdatetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #19
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localtime('12:31:14.645') AS tt RETURN localdatetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #20
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localtime('12:31:14.645') AS tt RETURN localdatetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #21
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #22
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, localdatetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects

  Scenario: Should select date and time into local date time #23
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({datetime: dd, time: tt}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:14.645000' |
    And no side effects

  Scenario: Should select date and time into local date time #24
    Given any graph
    When executing query:
      """
      WITH datetime('2000-02-29T01:02:03') AS dd, datetime('1999-01-01T12:31:14.645') AS tt RETURN localdatetime({datetime: dd, time: tt, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '2000-02-29T12:31:42' |
    And no side effects
