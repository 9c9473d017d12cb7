"""Two-process multi-host execution (SURVEY §2.3 comm-backend row).

Runs benchmarks/multihost_check.py: a real ``jax.distributed`` cluster
of two local processes with a localhost coordinator; a row-sharded fit
over the 8-device global mesh spans both processes and must equal the
single-process result.
"""

import importlib.util
import pathlib


def test_two_process_multihost(tmp_path):
    path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "benchmarks"
        / "multihost_check.py"
    )
    spec = importlib.util.spec_from_file_location("multihost_check", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    result = mod.run(str(tmp_path / "mh.json"))
    assert result["process_count"] == 2
    assert result["global_devices"] == 8
    assert result["sigma_rel_diff_vs_single_process"] < 1e-4
    assert result["component_alignment_min"] > 1 - 1e-4
    # Streamed multi-host fits (per-process block feeds + moment fold)
    # match the single-process stream to f64 roundoff.
    assert result["streamed_exact_sigma_rel_diff"] < 1e-9
    assert result["streamed_randomized_sigma_rel_diff"] < 1e-9
    assert result["streamed_partial_fit_sigma_rel_diff"] < 1e-9
    assert result["ok"] is True
