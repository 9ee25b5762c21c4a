"""Second half of the worked-example end-to-end pins — see
``test_examples.py`` for the harness rationale and the module-split
note (the sharded runner balances by module; one 17-pipeline file was
the suite's longest module by 2x)."""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# see test_examples.py — the slowest end-to-end replays are opt-in
# (`pytest -m heavy`), the cheap ones stay as default smoke coverage
_HEAVY = pytest.mark.heavy


@pytest.mark.parametrize(
    "module",
    [
        pytest.param("examples.embedding_curation_pipeline", marks=_HEAVY),
        pytest.param("examples.graph_diagnostics_pipeline", marks=_HEAVY),
        pytest.param("examples.eval_suite_pipeline", marks=_HEAVY),
        pytest.param("examples.vector_search_pipeline", marks=_HEAVY),
        pytest.param("examples.experimentation_pipeline", marks=_HEAVY),
        "examples.temporal_validation_pipeline",
        pytest.param("examples.vault_to_corpus_pipeline", marks=_HEAVY),
        pytest.param("examples.incremental_ingest_pipeline", marks=_HEAVY),
    ],
)
def test_example_pipeline_runs(spark, sf_dir, module, capsys):
    mod = importlib.import_module(module)
    mod.main(sf_dir)
    assert "PIPELINE OK" in capsys.readouterr().out
