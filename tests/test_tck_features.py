"""Run the Gherkin TCK feature corpus with the reference's blacklist
semantics (TckSparkCypherTest.scala:39-105): whitelisted scenarios must
pass, blacklisted scenarios must KEEP failing (a passing blacklisted
scenario is an error), and the per-feature coverage report is refreshed on
every run."""
import os

import pytest

from cypher_for_apache_flink_spark.tck import ScenarioFailure, TckSuite
from cypher_for_apache_flink_spark.tck.runner import run_scenario

HERE = os.path.dirname(__file__)
FEATURES = os.path.join(HERE, "tck", "features")
BLACKLISTS = {
    name: os.path.join(HERE, "tck", "blacklists", f"{name}_blacklist")
    for name in ("failing", "wont_fix", "temporal", "failure_reporting")
    if os.path.exists(
        os.path.join(HERE, "tck", "blacklists", f"{name}_blacklist"))
}

suite = TckSuite(FEATURES, BLACKLISTS)
_WHITE = suite.white_list
_BLACK = suite.black_list


def _ids(pairs):
    return [f"{f.name}::{s.name}" for f, s in pairs]


@pytest.mark.parametrize("feat,scenario", _WHITE, ids=_ids(_WHITE))
def test_tck_whitelist(spark, feat, scenario):
    run_scenario(spark, scenario, background=feat.background)


@pytest.mark.parametrize("feat,scenario", _BLACK, ids=_ids(_BLACK))
def test_tck_blacklist_still_fails(spark, feat, scenario):
    try:
        run_scenario(spark, scenario, background=feat.background)
    except Exception:
        return                         # still failing, as recorded
    pytest.fail(f"blacklisted scenario PASSES - remove from blacklist: "
                f"{scenario}")


def test_tck_no_stale_blacklist_entries():
    assert suite.stale_blacklist_entries() == []


def test_tck_coverage_report():
    report = suite.coverage_report()
    with open(os.path.join(HERE, "tck", "COVERAGE.md"), "w") as f:
        f.write("# TCK harness coverage\n\n```\n" + report + "\n```\n")
    print("\n" + report)
