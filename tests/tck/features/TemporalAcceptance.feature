Feature: TemporalAcceptance

  Scenario: Date construction and accessors
    Given any graph
    When executing query:
      """
      WITH date('2020-06-15') AS d
      RETURN d.year AS y, d.month AS m, d.day AS dd
      """
    Then the result should be, in any order:
      | y    | m | dd |
      | 2020 | 6 | 15 |
    And no side effects

  Scenario: Date plus a month duration clamps the day
    Given any graph
    When executing query:
      """
      RETURN toString(date('2020-01-31') + duration('P1M')) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2020-02-29' |
    And no side effects

  Scenario: Duration between two dates
    Given any graph
    When executing query:
      """
      RETURN duration.between(date('2020-01-01'), date('2020-03-01')).months AS m
      """
    Then the result should be, in any order:
      | m |
      | 2 |
    And no side effects

  Scenario: Datetime accessors
    Given any graph
    When executing query:
      """
      WITH localdatetime('2020-06-15T12:30:45') AS t
      RETURN t.hour AS h, t.minute AS m, t.second AS s
      """
    Then the result should be, in any order:
      | h  | m  | s  |
      | 12 | 30 | 45 |
    And no side effects

  Scenario: Temporal ordering
    Given any graph
    When executing query:
      """
      RETURN date('2020-01-01') < date('2020-06-01') AS lt
      """
    Then the result should be, in any order:
      | lt   |
      | true |
    And no side effects

  Scenario: Duration ISO string round trip
    Given any graph
    When executing query:
      """
      RETURN toString(duration('P1Y2M3DT4H5M6S')) AS s
      """
    Then the result should be, in any order:
      | s                |
      | 'P1Y2M3DT4H5M6S' |
    And no side effects

  Scenario: Truncating temporals to unit boundaries
    Given any graph
    When executing query:
      """
      RETURN toString(datetime.truncate('month',
                      localdatetime('2024-03-15T10:30:00'))) AS m,
             toString(date.truncate('week', date('2024-03-15'))) AS w
      """
    Then the result should be, in any order:
      | m                     | w            |
      | '2024-03-01T00:00:00' | '2024-03-11' |
    And no side effects

  Scenario: Negated durations shift the other way
    Given any graph
    When executing query:
      """
      RETURN toString(date('2020-01-02') + -duration('P1D')) AS r
      """
    Then the result should be, in any order:
      | r            |
      | '2020-01-01' |
    And no side effects
