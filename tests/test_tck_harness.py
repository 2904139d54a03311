"""Unit tests for the TCK harness itself (no Spark): the Gherkin parser,
the TCK value grammar, and the suite/blacklist bookkeeping."""
import textwrap

import pytest

from cypher_for_apache_flink_spark.tck.gherkin import (
    parse_feature,
    _split_table_row,
)
from cypher_for_apache_flink_spark.tck.runner import TckSuite, _interpret
from cypher_for_apache_flink_spark.tck.values import (
    TckValueError,
    canon_expected_value,
    canon_result_value,
    parse_tck_value,
)


def test_parse_feature_background_and_scenarios():
    feat = parse_feature(textwrap.dedent("""\
        Feature: Demo
          This free-form description is skipped.

          Background:
            Given an empty graph
            And having executed:
              \"\"\"
              CREATE (:A)
              \"\"\"

          Scenario: First
            When executing query:
              \"\"\"
              MATCH (n) RETURN n
              \"\"\"
            Then the result should be, in any order:
              | n    |
              | (:A) |
            And no side effects
        """))
    assert feat.name == "Demo"
    assert len(feat.background) == 2
    assert feat.background[1].docstring.strip() == "CREATE (:A)"
    (sc,) = feat.scenarios
    assert str(sc) == 'Feature "Demo": Scenario "First"'
    assert sc.steps[1].table == [["n"], ["(:A)"]]


def test_parse_scenario_outline_expands_examples():
    feat = parse_feature(textwrap.dedent("""\
        Feature: Outline
          Scenario Outline: Compare
            Given any graph
            When executing query:
              \"\"\"
              RETURN <lhs> < <rhs> AS lt
              \"\"\"
            Then the result should be, in any order:
              | lt       |
              | <result> |

            Examples:
              | lhs | rhs | result |
              | 1   | 2   | true   |
              | 3   | 2   | false  |
        """))
    assert [s.name for s in feat.scenarios] == ["Compare #1", "Compare #2"]
    assert "RETURN 1 < 2 AS lt" in feat.scenarios[0].steps[1].docstring
    assert feat.scenarios[1].steps[2].table[1] == ["false"]


def test_table_row_escaped_pipe():
    assert _split_table_row(r"| a \| b | c |") == ["a | b", "c"]


def test_tags_attach_to_next_scenario():
    feat = parse_feature(textwrap.dedent("""\
        Feature: Tagged
          @slow @skip
          Scenario: S
            Given any graph
            When executing query:
              \"\"\"
              RETURN 1 AS x
              \"\"\"
        """))
    assert feat.scenarios[0].tags == ("@slow", "@skip")


@pytest.mark.parametrize("cell,want", [
    ("1", ("int", 1)),
    ("-2.5", ("float", -2.5)),
    ("1e3", ("float", 1000.0)),
    ("'ab'", ("str", "ab")),
    ("true", ("bool", True)),
    ("null", ("null",)),
    ("[]", ("list", ())),
    ("[1, 'x']", ("list", (("int", 1), ("str", "x")))),
    ("{a: 1}", ("map", (("a", ("int", 1)),))),
    ("(:A:B {p: 1})",
     ("node", frozenset({"A", "B"}), (("p", ("int", 1)),))),
    ("()", ("node", frozenset(), ())),
    ("[:T {w: 2}]", ("rel", "T", (("w", ("int", 2)),))),
])
def test_parse_tck_value(cell, want):
    assert parse_tck_value(cell) == want


def test_parse_tck_value_path():
    v = parse_tck_value("<(:A)-[:R]->(:B)>")
    assert v[0] == "path"
    assert v[1][0] == ("node", frozenset({"A"}), ())
    assert v[1][1] == (">", ("rel", "R", ()))


def test_parse_tck_value_trailing_garbage_rejected():
    with pytest.raises(TckValueError):
        parse_tck_value("1 2")


def test_canon_result_matches_expected_for_entities():
    node = {"id": 7, "labels": {"A"}, "properties": {"p": 1}}
    assert canon_result_value(node) == parse_tck_value("(:A {p: 1})")
    rel = {"id": 8, "source": 1, "target": 2, "type": "T",
           "properties": {}}
    assert canon_result_value(rel) == parse_tck_value("[:T]")
    # ids are NOT part of equality; a null id is a null entity
    assert canon_result_value({"id": None, "labels": set(),
                               "properties": {}}) == ("null",)


def test_canon_unordered_lists():
    got = canon_result_value([2, 1], unordered_lists=True)
    want = canon_expected_value(parse_tck_value("[1, 2]"),
                                unordered_lists=True)
    assert got == want
    assert canon_result_value([1, 1], True) != canon_result_value([1], True)


def test_float_normalization_bridges_repr_noise():
    assert canon_result_value(0.1 + 0.2) == parse_tck_value("0.3")


def test_interpret_steps_to_plan():
    feat = parse_feature(textwrap.dedent("""\
        Feature: P
          Scenario: S
            Given an empty graph
            And having executed:
              \"\"\"
              CREATE (:A)
              \"\"\"
            And parameters are:
              | k | [1, 2] |
            When executing query:
              \"\"\"
              RETURN $k AS k
              \"\"\"
            Then the result should be, in order:
              | k |
              | 1 |
            And no side effects
        """))
    plan = _interpret(feat.scenarios[0].steps)
    assert plan.setup == ["CREATE (:A)"]
    assert plan.params == {"k": [1, 2]}
    assert plan.ordered is True
    assert plan.expect_rows == [["k"], ["1"]]


def test_error_step_recognized():
    feat = parse_feature(textwrap.dedent("""\
        Feature: E
          Scenario: S
            Given any graph
            When executing query:
              \"\"\"
              RETURN
              \"\"\"
            Then a SyntaxError should be raised at compile time: Boom
        """))
    plan = _interpret(feat.scenarios[0].steps)
    assert plan.expect_error == "SyntaxError"


def test_suite_stale_blacklist_detection(tmp_path):
    fdir = tmp_path / "features"
    fdir.mkdir()
    (fdir / "X.feature").write_text(textwrap.dedent("""\
        Feature: X
          Scenario: Real
            Given any graph
            When executing query:
              \"\"\"
              RETURN 1 AS x
              \"\"\"
        """))
    bl = tmp_path / "failing_blacklist"
    bl.write_text('Feature "X": Scenario "Real"\n'
                  'Feature "X": Scenario "Gone"\n')
    suite = TckSuite(str(fdir), {"failing": str(bl)})
    assert suite.stale_blacklist_entries() == ['Feature "X": Scenario "Gone"']
    assert [s.name for _, s in suite.black_list] == ["Real"]
    assert suite.white_list == []
    assert "X: 0/1" in suite.coverage_report()


def test_wrong_error_type_is_a_failure(spark):
    """ADVICE r5: an expected-error step is satisfied only by an ENGINE
    error of the declared TCK kind — a TypeError-shaped exception must not
    pass a SyntaxError assertion (the reference's failure_reporting
    category, TckSparkCypherTest.scala:51-55)."""
    import pytest

    from cypher_for_apache_flink_spark.tck.runner import (
        ScenarioFailure, run_scenario)
    feat = parse_feature(textwrap.dedent("""\
        Feature: E
          Scenario: S
            Given any graph
            When executing query:
              \"\"\"
              RETURN 1 / 0 AS x
              \"\"\"
            Then a SyntaxError should be raised at compile time: Nope
        """))
    # the engine raises an ArithmeticError at runtime -> both the kind and
    # the phase mismatch must surface as a ScenarioFailure, not a pass
    with pytest.raises(ScenarioFailure, match="expected a SyntaxError"):
        run_scenario(spark, feat.scenarios[0])


def test_harness_error_never_satisfies_expected_error(spark):
    """A broken fixture (graph setup failure) must not count as the
    scenario's expected error (ADVICE r5 medium)."""
    import pytest

    from cypher_for_apache_flink_spark.tck.runner import (
        HarnessError, run_scenario)
    feat = parse_feature(textwrap.dedent("""\
        Feature: E
          Scenario: S
            Given an empty graph
            And having executed:
              \"\"\"
              THIS IS NOT CYPHER AT ALL (((
              \"\"\"
            When executing query:
              \"\"\"
              RETURN 1 AS x
              \"\"\"
            Then a SyntaxError should be raised at compile time: Nope
        """))
    with pytest.raises(HarnessError):
        run_scenario(spark, feat.scenarios[0])


def test_error_phase_mismatch_is_a_failure(spark):
    """A runtime error must not satisfy a compile-time expectation."""
    import pytest

    from cypher_for_apache_flink_spark.tck.runner import (
        ScenarioFailure, run_scenario)
    feat = parse_feature(textwrap.dedent("""\
        Feature: E
          Scenario: S
            Given any graph
            When executing query:
              \"\"\"
              RETURN 1 / 0 AS x
              \"\"\"
            Then a ArithmeticError should be raised at compile time: DivideByZero
        """))
    with pytest.raises(ScenarioFailure, match="raised at runtime"):
        run_scenario(spark, feat.scenarios[0])
