Feature: MapAcceptance

  Scenario: Map literal access by key
    Given any graph
    When executing query:
      """
      RETURN {a: 1}['b'] AS miss, {a: 1}['a'] AS hit, {a: 1}.a AS dot
      """
    Then the result should be, in any order:
      | miss | hit | dot |
      | null | 1   | 1   |
    And no side effects

  Scenario: Nested map literals
    Given any graph
    When executing query:
      """
      RETURN {outer: {inner: 7}}['outer']['inner'] AS v
      """
    Then the result should be, in any order:
      | v |
      | 7 |
    And no side effects

  Scenario: Returning a map literal
    Given any graph
    When executing query:
      """
      RETURN {name: 'x', nums: [1, 2]} AS m
      """
    Then the result should be, in any order:
      | m                          |
      | {name: 'x', nums: [1, 2]}  |
    And no side effects

  Scenario: Keys of a map literal include null-valued keys
    Given any graph
    When executing query:
      """
      RETURN keys({a: 1, b: null}) AS ks
      """
    Then the result should be, in any order, ignoring element order for lists:
      | ks         |
      | ['a', 'b'] |
    And no side effects

  Scenario: Map equality ignores key declaration order
    Given any graph
    When executing query:
      """
      RETURN {a: 1, b: 2} = {b: 2, a: 1} AS eq,
             {a: 1} = {b: 1} AS diff,
             {a: 1} = {a: 1, b: 2} AS subset,
             {a: 1, b: 2} = {a: 1, b: 3} AS vals
      """
    Then the result should be, in any order:
      | eq   | diff  | subset | vals  |
      | true | false | false  | false |
    And no side effects

  Scenario: Reduce can collect into an empty list accumulator
    Given any graph
    When executing query:
      """
      RETURN reduce(acc = [], x IN [1, 2] | acc + x) AS r
      """
    Then the result should be, in any order:
      | r      |
      | [1, 2] |
    And no side effects
