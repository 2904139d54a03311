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
