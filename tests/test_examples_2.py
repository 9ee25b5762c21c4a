"""Second half of the worked-example end-to-end pins — see
``test_examples.py`` for the harness rationale and the module-split
note (the sharded runner balances by module; one 17-pipeline file was
the suite's longest module by 2x)."""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.parametrize(
    "module",
    [
        "examples.embedding_curation_pipeline",
        "examples.graph_diagnostics_pipeline",
        "examples.eval_suite_pipeline",
        "examples.vector_search_pipeline",
        "examples.experimentation_pipeline",
        "examples.temporal_validation_pipeline",
        "examples.vault_to_corpus_pipeline",
        "examples.incremental_ingest_pipeline",
    ],
)
def test_example_pipeline_runs(spark, sf_dir, module, capsys):
    mod = importlib.import_module(module)
    mod.main(sf_dir)
    assert "PIPELINE OK" in capsys.readouterr().out
