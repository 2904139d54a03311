"""openCypher TCK harness: a Gherkin ``.feature`` parser, a TCK-value
grammar, and a scenario runner with the reference's blacklist semantics
(whitelisted scenarios must pass; blacklisted scenarios must KEEP failing;
per-feature coverage is reported).

Reference analogue: the ``okapi-tck`` module + the morpheus runner
(morpheus-tck/.../TckSparkCypherTest.scala:39-105, blacklist resources
:51-55, coverage report :83-105).  The published TCK artifact is not
vendored here; the feature corpus under ``tests/tck/features`` is authored
in the same Gherkin dialect, so the published files drop in unchanged.
"""
from .gherkin import Feature, Scenario, Step, load_features, parse_feature
from .runner import ScenarioFailure, TckSuite, run_scenario

__all__ = [
    "Feature", "Scenario", "Step", "load_features", "parse_feature",
    "ScenarioFailure", "TckSuite", "run_scenario",
]
