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
      WITH localdatetime('1984-10-11T12:31:14') AS dd RETURN date({date: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should select date #3
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, day: 28}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-28' |
    And no side effects

  Scenario: Should select date #4
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14') AS dd RETURN date({date: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-10-11' |
    And no side effects

  Scenario: Should select date #5
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14') AS dd RETURN date({datetime: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11' |
    And no side effects

  Scenario: Should select date #6
    Given any graph
    When executing query:
      """
      WITH date('1984-10-11') AS dd RETURN date({date: dd, month: 5}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-05-11' |
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
      WITH date('1984-10-11') AS dd RETURN localdatetime({date: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-10-11T00:00:00' |
    And no side effects

  Scenario: Should select datetime into local date time #1
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS dd RETURN localdatetime({datetime: dd}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select datetime into local date time #2
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS dd RETURN localdatetime({datetime: dd, minute: 0}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-11T12:00:14.645000' |
    And no side effects

  Scenario: Should select datetime into local date time #3
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS dd RETURN localdatetime({datetime: dd, day: 28, second: 42}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1984-10-28T12:31:42' |
    And no side effects

  Scenario: Should select datetime into local date time #4
    Given any graph
    When executing query:
      """
      WITH localdatetime('1984-10-11T12:31:14.645') AS dd RETURN localdatetime({datetime: dd, year: 1990}) AS d
      """
    Then the result should be, in any order:
      | d |
      | '1990-10-11T12:31:14.645000' |
    And no side effects

  Scenario: Should select time #1
    Given any graph
    When executing query:
      """
      RETURN time({time: localtime({hour: 12})}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:00:00Z' |
    And no side effects

  Scenario: Should select time #2
    Given any graph
    When executing query:
      """
      WITH localtime({hour: 12}) AS tt RETURN localtime({time: tt, minute: 5}) AS t
      """
    Then the result should be, in any order:
      | t |
      | '12:05:00' |
    And no side effects
