Feature: TemporalAccessorAcceptance

  Scenario: Should provide accessors for date
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS d RETURN d.year AS y, d.month AS mo, d.day AS dd, d.weekYear AS wy, d.week AS w, d.dayOfWeek AS dow, d.ordinalDay AS od, d.quarter AS qq, d.dayOfQuarter AS doq
      """
    Then the result should be, in any order:
      | y | mo | dd | wy | w | dow | od | qq | doq |
      | 1984 | 10 | 11 | 1984 | 41 | 4 | 285 | 4 | 11 |
    And no side effects

  Scenario: Should provide accessors for local date time
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645876') AS d RETURN d.hour AS h, d.minute AS mi, d.second AS s, d.millisecond AS ms, d.microsecond AS us
      """
    Then the result should be, in any order:
      | h | mi | s | ms | us |
      | 12 | 31 | 14 | 645 | 645876 |
    And no side effects

  Scenario: Should provide accessors for date time
    Given any graph
    When executing query:
      """
      WITH datetime('1984-10-11T12:31:14.645876') AS d RETURN d.hour AS h, d.minute AS mi, d.second AS s, d.millisecond AS ms, d.microsecond AS us
      """
    Then the result should be, in any order:
      | h | mi | s | ms | us |
      | 12 | 31 | 14 | 645 | 645876 |
    And no side effects

  Scenario: Should provide accessors for time
    Given any graph
    When executing query:
      """
      WITH time('12:31:14.645876+01:30') AS d RETURN d.hour AS h, d.minute AS mi, d.second AS s, d.millisecond AS ms, d.microsecond AS us, d.offset AS o, d.offsetMinutes AS om, d.offsetSeconds AS os
      """
    Then the result should be, in any order:
      | h | mi | s | ms | us | o | om | os |
      | 12 | 31 | 14 | 645 | 645876 | '+01:30' | 90 | 5400 |
    And no side effects

  Scenario: Should provide accessors for local time
    Given any graph
    When executing query:
      """
      WITH localtime('12:31:14.645876') AS d RETURN d.hour AS h, d.minute AS mi, d.second AS s, d.millisecond AS ms, d.microsecond AS us
      """
    Then the result should be, in any order:
      | h | mi | s | ms | us |
      | 12 | 31 | 14 | 645 | 645876 |
    And no side effects

  Scenario: Should provide accessors for duration
    Given any graph
    When executing query:
      """
      WITH duration('P1Y5M26DT20H15M12.345S') AS d RETURN d.years AS y, d.months AS mo, d.monthsOfYear AS moy, d.weeks AS w, d.days AS dd, d.hours AS h, d.minutesOfHour AS mih, d.seconds AS s, d.millisecondsOfSecond AS ms
      """
    Then the result should be, in any order:
      | y | mo | moy | w | dd | h | mih | s | ms |
      | 1 | 17 | 5 | 3 | 26 | 20 | 15 | 72912 | 345 |
    And no side effects
