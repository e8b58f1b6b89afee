"""Phase-checkpoint invalidation for the 10M builder (ADVICE r8): a
VERSION / param bump between runs must re-run the affected phases instead
of trusting _SUCCESS markers and stamping the new version onto unchanged
bytes (pack_dtype drift would make serving frombuffer-reshape garbage)."""

import json
import os

import tools.build_vamana_10m as b10


def _touch_tree(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass


def _fake_build_outputs(monkeypatch, tmp_path):
    work = str(tmp_path / "work")
    art = str(tmp_path / "art.parquet")
    meta = art + ".meta.json"
    monkeypatch.setattr(b10, "WORK", work)
    monkeypatch.setattr(b10, "ART_PATH", art)
    monkeypatch.setattr(b10, "META_PATH", meta)
    monkeypatch.setattr(b10, "NSLICES", 2)
    os.makedirs(work, exist_ok=True)
    _touch_tree(os.path.join(work, "assigned"))
    with open(os.path.join(work, "centroids.npy"), "w"):
        pass
    for s in range(2):
        _touch_tree(os.path.join(work, f"edges_{s}"))
        _touch_tree(os.path.join(art, f"slice={s}"))
    with open(os.path.join(art, "_SUCCESS"), "w"):
        pass
    with open(meta, "w") as f:
        json.dump({"version": b10.VERSION, "pack_dtype": b10.PACK_DTYPE}, f)
    st = {"phase_sec": {"assign": 1.0, "build_0": 2.0, "build_1": 2.0,
                        "pack_0": 3.0, "pack_1": 3.0},
          "n_subshards": 4, "phase_params": b10._phase_params()}
    b10._save_state(st)
    return work, art, meta, st


def test_same_params_keep_everything(monkeypatch, tmp_path):
    work, art, meta, st = _fake_build_outputs(monkeypatch, tmp_path)
    out = b10._invalidate_stale_phases(b10._state())
    assert b10._done(os.path.join(work, "assigned"))
    assert b10._done(os.path.join(work, "edges_0"))
    assert b10._done(os.path.join(art, "slice=0"))
    assert os.path.exists(meta)
    assert out["phase_sec"] == st["phase_sec"]


def test_version_bump_invalidates_pack_only(monkeypatch, tmp_path):
    work, art, meta, _ = _fake_build_outputs(monkeypatch, tmp_path)
    monkeypatch.setattr(b10, "VERSION", b10.VERSION + 1)
    out = b10._invalidate_stale_phases(b10._state())
    # A and B survive; C (slices + META + root _SUCCESS) is gone
    assert b10._done(os.path.join(work, "assigned"))
    assert b10._done(os.path.join(work, "edges_0"))
    assert not os.path.exists(os.path.join(art, "slice=0"))
    assert not os.path.exists(os.path.join(art, "_SUCCESS"))
    assert not os.path.exists(meta)
    assert "pack_0" not in out["phase_sec"]
    assert out["phase_sec"]["build_0"] == 2.0
    # the new fingerprint is recorded so a rerun with these params resumes
    assert out["phase_params"] == b10._phase_params()


def test_graph_param_change_invalidates_edges_and_pack(monkeypatch, tmp_path):
    work, art, meta, _ = _fake_build_outputs(monkeypatch, tmp_path)
    monkeypatch.setattr(b10, "DEGREE_BOUND", 16)
    out = b10._invalidate_stale_phases(b10._state())
    assert b10._done(os.path.join(work, "assigned"))
    assert not os.path.exists(os.path.join(work, "edges_0"))
    assert not os.path.exists(os.path.join(art, "slice=1"))
    assert "build_1" not in out["phase_sec"]
    assert out["phase_sec"].get("assign") == 1.0


def test_assign_param_change_invalidates_all(monkeypatch, tmp_path):
    work, art, meta, _ = _fake_build_outputs(monkeypatch, tmp_path)
    monkeypatch.setattr(b10, "NUM_SHARDS", 1280)
    out = b10._invalidate_stale_phases(b10._state())
    assert not os.path.exists(os.path.join(work, "assigned"))
    assert not os.path.exists(os.path.join(work, "centroids.npy"))
    assert not os.path.exists(os.path.join(work, "edges_0"))
    assert not os.path.exists(os.path.join(art, "slice=0"))
    assert out["phase_sec"] == {}
    assert "n_subshards" not in out


def test_legacy_state_adopts_meta_params(monkeypatch, tmp_path):
    """Pre-fingerprint workdir + completed META: params reconstructed from
    META, so a matching build resumes untouched but a version bump over the
    legacy state still wipes phase C."""
    work, art, meta, st = _fake_build_outputs(monkeypatch, tmp_path)
    st.pop("phase_params")
    b10._save_state(st)
    with open(meta, "w") as f:
        json.dump({
            "version": b10.VERSION, "pack_dtype": b10.PACK_DTYPE,
            "rows": b10.ROWS, "num_shards": b10.NUM_SHARDS,
            "max_shard_rows": b10.MAX_SHARD_ROWS,
            "degree_bound": b10.DEGREE_BOUND,
            "search_size": b10.SEARCH_SIZE, "metric": b10.METRIC,
            "build_mode": "batch", "build_passes": 1,
        }, f)
    out = b10._invalidate_stale_phases(b10._state())
    assert b10._done(os.path.join(art, "slice=0"))  # matching build kept
    assert out["phase_params"] == b10._phase_params()
    # now the bump scenario on a fresh legacy state
    st.pop("phase_params", None)
    b10._save_state(st)
    monkeypatch.setattr(b10, "PACK_DTYPE", "float32")
    out = b10._invalidate_stale_phases(b10._state())
    assert not os.path.exists(os.path.join(art, "slice=0"))
    assert b10._done(os.path.join(work, "edges_0"))


def test_legacy_state_without_meta_adopts_current(monkeypatch, tmp_path):
    """Mid-build crash before META: same-session resume keeps the phase
    outputs (old trust-the-marker behavior, now stamped going forward)."""
    work, art, meta, st = _fake_build_outputs(monkeypatch, tmp_path)
    st.pop("phase_params")
    b10._save_state(st)
    os.remove(meta)
    out = b10._invalidate_stale_phases(b10._state())
    assert b10._done(os.path.join(work, "assigned"))
    assert b10._done(os.path.join(work, "edges_1"))
    assert out["phase_params"] == b10._phase_params()
