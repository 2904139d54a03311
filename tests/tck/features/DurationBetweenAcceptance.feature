Feature: DurationBetweenAcceptance

  Scenario: Should compute duration between two temporals #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('1984-10-11'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M13D' |
    And no side effects

  Scenario: Should compute duration between two temporals #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2015-06-24'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-30Y-8M-13D' |
    And no side effects

  Scenario: Should compute duration between two temporals #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('1984-10-11'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M13DT12H16M48S' |
    And no side effects

  Scenario: Should compute duration between two temporals #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('1984-10-11T12:31:14.645876'), localdatetime('2015-06-24T12:16:48.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M12DT23H45M34S' |
    And no side effects

  Scenario: Should compute duration between two temporals #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2015-06-24T12:16:48.645876'), localdatetime('1984-10-11T12:31:14.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-30Y-8M-12DT-23H-45M-34S' |
    And no side effects

  Scenario: Should compute duration between two temporals #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2015-07-21T21:40:32.142'), localdatetime('2016-07-21T21:45:22.142'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1YT4M50S' |
    And no side effects

  Scenario: Should compute duration between two temporals #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localtime('12:00:00'), localtime('13:30:15'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H30M15S' |
    And no side effects

  Scenario: Should compute duration between two temporals #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localtime('23:00:00'), localtime('01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-22H' |
    And no side effects

  Scenario: Should compute duration between two temporals #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(time('12:00:00Z'), time('13:00:00+01:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals #10
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(time('09:00:00-05:00'), time('15:00:00Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H' |
    And no side effects

  Scenario: Should compute duration between two temporals #11
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2018-01-01'), date('2018-12-31'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P11M30D' |
    And no side effects

  Scenario: Should compute duration between two temporals #12
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('1999-12-31'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1D' |
    And no side effects

  Scenario: Should compute duration between two temporals #13
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2016-02-29'), date('2017-03-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y1D' |
    And no side effects

  Scenario: Should compute duration between two temporals #14
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2018-01-31T23:00:00'), localdatetime('2018-02-01T01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT2H' |
    And no side effects

  Scenario: Should compute duration between two temporals #15
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2000-01-01T00:00:00'), localdatetime('2000-01-01T00:00:00.000001'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0.000001S' |
    And no side effects

  Scenario: Should compute duration between two temporals #16
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('1900-01-01'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P100Y' |
    And no side effects

  Scenario: Should compute duration between two temporals #17
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('1984-10-11T12:31:14'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M12DT11H28M46S' |
    And no side effects

  Scenario: Should compute duration between two temporals #18
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2015-06-24T12:16:48'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals #19
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localtime('00:00:00'), localtime('23:59:59.999999'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT23H59M59.999999S' |
    And no side effects

  Scenario: Should compute duration between two temporals #20
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(time('18:45:00+14:00'), time('06:15:30.5+01:00:30'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT30M0.5S' |
    And no side effects

  Scenario: Should compute duration between two temporals #21
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2021-03-01'), date('2021-02-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-1M' |
    And no side effects

  Scenario: Should compute duration between two temporals #22
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2019-05-06T07:08:09.1'), localdatetime('2019-05-06T07:08:09.05'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-0.05S' |
    And no side effects

  Scenario: Should compute duration between two temporals #23
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('1969-07-20'), localdatetime('1969-07-21T02:56:15'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1DT2H56M15S' |
    And no side effects

  Scenario: Should compute duration between two temporals #24
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2024-01-01T00:00:00'), localdatetime('2023-12-31T23:59:59'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-1S' |
    And no side effects

  Scenario: Should compute duration between two temporals #25
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(time('00:00:00Z'), time('00:00:00.000001Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0.000001S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('1984-10-11'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('2015-06-24'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-30Y-8M' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('1984-10-11'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('1984-10-11T12:31:14.645876'), localdatetime('2015-06-24T12:16:48.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('2015-06-24T12:16:48.645876'), localdatetime('1984-10-11T12:31:14.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-30Y-8M' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('2015-07-21T21:40:32.142'), localdatetime('2016-07-21T21:45:22.142'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localtime('12:00:00'), localtime('13:30:15'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localtime('23:00:00'), localtime('01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(time('12:00:00Z'), time('13:00:00+01:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #10
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(time('09:00:00-05:00'), time('15:00:00Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #11
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('2018-01-01'), date('2018-12-31'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P11M' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #12
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('1999-12-31'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #13
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('2016-02-29'), date('2017-03-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #14
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('2018-01-31T23:00:00'), localdatetime('2018-02-01T01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #15
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('2000-01-01T00:00:00'), localdatetime('2000-01-01T00:00:00.000001'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #16
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('1900-01-01'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P100Y' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #17
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('1984-10-11T12:31:14'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P30Y8M' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #18
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('2015-06-24T12:16:48'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #19
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localtime('00:00:00'), localtime('23:59:59.999999'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #20
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(time('18:45:00+14:00'), time('06:15:30.5+01:00:30'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in months #21
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('2021-03-01'), date('2021-02-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-1M' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('1984-10-11'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P11213D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('2015-06-24'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-11213D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('1984-10-11'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P11213D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localdatetime('1984-10-11T12:31:14.645876'), localdatetime('2015-06-24T12:16:48.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P11212D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localdatetime('2015-06-24T12:16:48.645876'), localdatetime('1984-10-11T12:31:14.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-11212D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localdatetime('2015-07-21T21:40:32.142'), localdatetime('2016-07-21T21:45:22.142'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P366D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localtime('12:00:00'), localtime('13:30:15'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localtime('23:00:00'), localtime('01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(time('12:00:00Z'), time('13:00:00+01:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #10
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(time('09:00:00-05:00'), time('15:00:00Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #11
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('2018-01-01'), date('2018-12-31'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P364D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #12
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('1999-12-31'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #13
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('2016-02-29'), date('2017-03-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P366D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #14
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localdatetime('2018-01-31T23:00:00'), localdatetime('2018-02-01T01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #15
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localdatetime('2000-01-01T00:00:00'), localdatetime('2000-01-01T00:00:00.000001'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #16
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('1900-01-01'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P36524D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #17
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localdatetime('1984-10-11T12:31:14'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P11212D' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #18
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localdatetime('2015-06-24T12:16:48'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #19
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(localtime('00:00:00'), localtime('23:59:59.999999'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #20
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(time('18:45:00+14:00'), time('06:15:30.5+01:00:30'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in days #21
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('2021-03-01'), date('2021-02-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-28D' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('1984-10-11'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT269112H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('2015-06-24'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-269112H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('1984-10-11'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT269124H16M48S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('1984-10-11T12:31:14.645876'), localdatetime('2015-06-24T12:16:48.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT269111H45M34S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T12:16:48.645876'), localdatetime('1984-10-11T12:31:14.645876'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-269111H-45M-34S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-07-21T21:40:32.142'), localdatetime('2016-07-21T21:45:22.142'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT8784H4M50S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localtime('12:00:00'), localtime('13:30:15'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H30M15S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localtime('23:00:00'), localtime('01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-22H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(time('12:00:00Z'), time('13:00:00+01:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #10
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(time('09:00:00-05:00'), time('15:00:00Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #11
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('2018-01-01'), date('2018-12-31'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT8736H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #12
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('1999-12-31'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT24H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #13
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('2016-02-29'), date('2017-03-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT8784H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #14
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2018-01-31T23:00:00'), localdatetime('2018-02-01T01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT2H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #15
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2000-01-01T00:00:00'), localdatetime('2000-01-01T00:00:00.000001'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0.000001S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #16
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('1900-01-01'), date('2000-01-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT876576H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #17
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('1984-10-11T12:31:14'), date('2015-06-24'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT269099H28M46S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #18
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T12:16:48'), localdatetime('2015-06-24T12:16:48'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #19
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localtime('00:00:00'), localtime('23:59:59.999999'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT23H59M59.999999S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #20
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(time('18:45:00+14:00'), time('06:15:30.5+01:00:30'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT30M0.5S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #21
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('2021-03-01'), date('2021-02-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-672H' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #22
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2019-05-06T07:08:09.1'), localdatetime('2019-05-06T07:08:09.05'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-0.05S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #23
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('1969-07-20'), localdatetime('1969-07-21T02:56:15'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT26H56M15S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #24
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2024-01-01T00:00:00'), localdatetime('2023-12-31T23:59:59'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-1S' |
    And no side effects

  Scenario: Should compute duration between two temporals in seconds #25
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(time('00:00:00Z'), time('00:00:00.000001Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0.000001S' |
    And no side effects

  Scenario: Should compute negative duration between in big units #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(date('2015-06-24'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-30Y-8M' |
    And no side effects

  Scenario: Should compute negative duration between in big units #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(date('2015-06-24'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-11213D' |
    And no side effects

  Scenario: Should compute negative duration between in big units #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T12:00:00'), localdatetime('2015-06-23T12:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-24H' |
    And no side effects

  Scenario: Should compute negative duration between in big units #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2015-06-24T12:00:00'), localdatetime('2014-06-23T12:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-1Y-1D' |
    And no side effects

  Scenario: Should compute negative duration between in big units #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inMonths(localdatetime('2015-06-24T12:00:00'), localdatetime('2014-05-23T11:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-1Y-1M' |
    And no side effects

  Scenario: Should compute durations with no difference #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('1984-10-11'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute durations with no difference #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('1984-10-11T12:31:14'), localdatetime('1984-10-11T12:31:14'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute durations with no difference #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('1984-10-11'), date('1984-10-11'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute durations with no difference #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(time('12:00:00Z'), time('12:00:00Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should compute durations with no difference #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localtime('12:31:14'), localtime('12:31:14'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0S' |
    And no side effects

  Scenario: Should split between boundaries correctly #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2018-01-31'), date('2018-03-01'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1M1D' |
    And no side effects

  Scenario: Should split between boundaries correctly #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2018-03-01'), date('2018-01-31'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P-1M-1D' |
    And no side effects

  Scenario: Should split between boundaries correctly #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2016-02-29'), date('2017-02-28'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1Y' |
    And no side effects

  Scenario: Should split between boundaries correctly #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('2016-01-31'), date('2016-02-29'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1M' |
    And no side effects

  Scenario: Should split between boundaries correctly #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2018-01-31T23:00:00'), localdatetime('2018-02-01T01:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT2H' |
    And no side effects

  Scenario: Should split between boundaries correctly #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2018-02-01T01:00:00'), localdatetime('2018-01-31T23:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-2H' |
    And no side effects

  Scenario: Should propagate null #1
    Given any graph
    When executing query:
      """
      RETURN duration.between(null, date('1984-10-11')) IS NULL AS a, duration.between(date('1984-10-11'), null) IS NULL AS b
      """
    Then the result should be, in any order:
      | a | b |
      | true | true |
    And no side effects

  Scenario: Should propagate null #2
    Given any graph
    When executing query:
      """
      RETURN duration.inMonths(null, date('1984-10-11')) IS NULL AS a, duration.inMonths(date('1984-10-11'), null) IS NULL AS b
      """
    Then the result should be, in any order:
      | a | b |
      | true | true |
    And no side effects

  Scenario: Should propagate null #3
    Given any graph
    When executing query:
      """
      RETURN duration.inDays(null, date('1984-10-11')) IS NULL AS a, duration.inDays(date('1984-10-11'), null) IS NULL AS b
      """
    Then the result should be, in any order:
      | a | b |
      | true | true |
    And no side effects

  Scenario: Should propagate null #4
    Given any graph
    When executing query:
      """
      RETURN duration.inSeconds(null, date('1984-10-11')) IS NULL AS a, duration.inSeconds(date('1984-10-11'), null) IS NULL AS b
      """
    Then the result should be, in any order:
      | a | b |
      | true | true |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T12:00:00'), localdatetime('2015-06-24T11:59:59.5'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-0.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T12:00:00.2'), localdatetime('2015-06-24T11:59:58.7'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-1.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T11:59:59.5'), localdatetime('2015-06-24T12:00:00'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT0.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T11:59:58.7'), localdatetime('2015-06-24T12:00:00.2'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(time('12:00:00Z'), time('11:59:59.5Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-0.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(time('12:00:00.2Z'), time('11:59:58.7Z'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-1.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localtime('12:00:00'), localtime('11:59:59.5'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-0.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localtime('12:00:00.2'), localtime('11:59:58.7'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-1.5S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T12:00:01.1'), localdatetime('2015-06-24T11:59:59.9'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-1.2S' |
    And no side effects

  Scenario: Should handle when seconds and subseconds have different signs #10
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(localdatetime('2015-06-24T11:59:59.9'), localdatetime('2015-06-24T12:00:01.1'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1.2S' |
    And no side effects

  Scenario: Should handle large durations
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(date('1000-01-01'), date('3000-12-31'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P2000Y11M30D' |
    And no side effects

  Scenario: Should handle large durations in seconds
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(date('1000-01-01'), date('3000-12-31'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT17540376H' |
    And no side effects

  Scenario: Should compute duration between if they differ only by a fraction of a second and the first comes after the second.
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(localdatetime('2015-06-24T12:00:00.5'), localdatetime('2015-06-24T12:00:00.2'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-0.3S' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #1
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-10-29T00:00+02:00[Europe/Stockholm]'), datetime('2017-10-29T04:00+01:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT5H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #2
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-10-28T12:00+02:00[Europe/Stockholm]'), datetime('2017-10-29T12:00+01:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1D' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #3
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-03-26T01:00+01:00[Europe/Stockholm]'), datetime('2017-03-26T03:00+02:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #4
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-10-29T04:00+01:00[Europe/Stockholm]'), datetime('2017-10-29T00:00+02:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-5H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #5
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-10-28T23:00+02:00[Europe/Stockholm]'), datetime('2017-10-29T23:30+01:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1DT30M' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #6
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inseconds(datetime('2017-10-29T00:00+02:00[Europe/Stockholm]'), datetime('2017-10-29T04:00+01:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT5H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #7
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-10-28T23:00+02:00[Europe/Stockholm]'), datetime('2017-10-29T04:00+01:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT6H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #8
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-10-29T04:00+01:00[Europe/Stockholm]'), datetime('2017-10-28T23:00+02:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT-6H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #9
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-10-29T00:00+02:00[Europe/Stockholm]'), datetime('2017-10-30T00:00+01:00[Europe/Stockholm]'))) AS d,
             toString(duration.inSeconds(datetime('2017-10-29T00:00+02:00[Europe/Stockholm]'), datetime('2017-10-30T00:00+01:00[Europe/Stockholm]'))) AS s
      """
    Then the result should be, in any order:
      | d | s |
      | 'P1D' | 'PT25H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #10
    Given any graph
    When executing query:
      """
      RETURN toString(duration.between(datetime('2017-03-25T00:00+01:00[Europe/Stockholm]'), datetime('2017-03-26T10:00+02:00[Europe/Stockholm]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'P1DT9H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #11
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inDays(datetime('2017-03-25T12:00+01:00[Europe/Stockholm]'), datetime('2017-03-26T12:00+02:00[Europe/Stockholm]'))) AS d,
             toString(duration.inMonths(datetime('2017-10-01T00:00+02:00[Europe/Stockholm]'), datetime('2017-11-01T00:00+01:00[Europe/Stockholm]'))) AS m
      """
    Then the result should be, in any order:
      | d | m |
      | 'P1D' | 'P1M' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day #12
    Given any graph
    When executing query:
      """
      RETURN toString(duration.inSeconds(datetime('2017-10-29T00:00+02:00[Europe/Stockholm]'), datetime('2017-10-28T19:00-04:00[America/New_York]'))) AS d
      """
    Then the result should be, in any order:
      | d |
      | 'PT1H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day with per-row zones #1
    Given any graph
    When executing query:
      """
      UNWIND ['Europe/Stockholm', 'America/New_York'] AS tz
      WITH tz, datetime({year: 2017, month: 10, day: 29, timezone: tz}) AS lo,
           datetime({year: 2017, month: 10, day: 30, hour: 4, timezone: tz}) AS hi
      RETURN tz, toString(duration.between(lo, hi)) AS d,
             toString(duration.inSeconds(lo, hi)) AS s
      """
    Then the result should be, in any order:
      | tz | d | s |
      | 'Europe/Stockholm' | 'P1DT4H' | 'PT29H' |
      | 'America/New_York' | 'P1DT4H' | 'PT28H' |
    And no side effects

  Scenario: Should handle durations at daylight saving time day with per-row zones #2
    Given any graph
    When executing query:
      """
      UNWIND ['Europe/Stockholm', '+02:00', '-05:00'] AS tz
      RETURN toString(datetime({year: 2017, month: 10, day: 29, timezone: tz})) AS s
      """
    Then the result should be, in any order:
      | s |
      | '2017-10-29T00:00:00+02:00[Europe/Stockholm]' |
      | '2017-10-29T00:00:00+02:00' |
      | '2017-10-29T00:00:00-05:00' |
    And no side effects
