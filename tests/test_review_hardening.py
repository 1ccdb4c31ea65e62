"""Regression tests for hardening fixes in the api/parallel layer:
zip-slip containment on model import, BASE-inheritance cycle detection,
integer leaves surviving the int8 quantize round-trip, and the multihost
single-process no-op.
"""

import os
import zipfile

import numpy as np
import pytest


def test_import_model_contains_traversal_members(tmp_path, monkeypatch):
    from empanada_tpu.api import export as E

    evil = tmp_path / "evil.empanada_tpu"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr(
            "m.yaml",
            "model_name: evil\nclass_names: {1: x}\nlabels: [1]\n"
            "thing_list: [1]\nnorms: {mean: 0.5, std: 0.2}\nmodel: w.eptpu\n",
        )
        zf.writestr("../../pwned.txt", b"x")
        zf.writestr("sub/dir/w.eptpu", b"weights")

    registry = tmp_path / "registry"
    monkeypatch.setattr(E, "MODEL_DIR", str(registry))
    import empanada_tpu.api.utils as U

    if hasattr(U, "MODEL_DIR"):
        monkeypatch.setattr(U, "MODEL_DIR", str(registry))

    E.import_model(str(evil))

    # every written file stays inside the registry; subdirectory members
    # are flattened instead of crashing
    written = []
    for root, _, files in os.walk(tmp_path):
        written += [os.path.join(root, f) for f in files]
    for f in written:
        assert str(tmp_path) in f
    names = {os.path.basename(f) for f in written}
    assert "w.eptpu" in names


def test_load_config_detects_base_cycle(tmp_path):
    from empanada_tpu.api.config import load_config

    (tmp_path / "a.yaml").write_text("BASE: b.yaml\nx: 1\n")
    (tmp_path / "b.yaml").write_text("BASE: a.yaml\ny: 2\n")
    with pytest.raises(ValueError, match="cycle"):
        load_config(str(tmp_path / "a.yaml"))


def test_quantize_roundtrip_preserves_integer_leaves():
    import jax.numpy as jnp

    from empanada_tpu.api.utils import _dequantize_tree, _quantize_variables

    tree = {
        "params": {
            "w": np.ones((512, 512), np.float32),
            "index_table": np.arange(70000, dtype=np.int64).reshape(1, -1),
        }
    }
    q = _quantize_variables(tree)
    assert np.issubdtype(np.asarray(q["params"]["index_table"]).dtype, np.integer)
    dq = _dequantize_tree(q, jnp.bfloat16)
    assert np.issubdtype(np.asarray(dq["params"]["index_table"]).dtype, np.integer)
    assert dq["params"]["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(dq["params"]["index_table"]), tree["params"]["index_table"]
    )


def test_initialize_multihost_single_process_noop():
    from empanada_tpu.parallel.multihost import initialize_multihost

    idx, cnt = initialize_multihost()
    assert idx == 0 and cnt >= 1
