"""Native scene-bank runtime tests: C++ gather/prefetch vs numpy fallback."""
import os

import numpy as np
import pytest

from hope_tpu.native import SceneBank, convert_npz_to_bank, load_library

_NPZ = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "dlp.npz")


@pytest.fixture(scope="module")
def bank_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("bank") / "dlp.htpb"
    convert_npz_to_bank(_NPZ, str(p))
    return str(p)


def _npz_ref(ids, E, S):
    d = np.load(_NPZ)
    w = np.asarray(ids) % len(d["n_polys"])
    return {
        "edges": d["edges"][w, :E],
        "edge_mask": d["edge_mask"][w, :E],
        "edge_poly": d["edge_poly"][w, :E],
        "n_polys": d["n_polys"][w],
        "dest": d["dest"][w],
        "starts": d["starts"][w, :S],
        "n_starts": np.minimum(d["n_starts"][w], S),
        "levels": d["levels"][w, :S],
    }


def test_native_library_builds():
    assert load_library() is not None, "g++ toolchain expected in this image"


def test_gather_matches_npz(bank_path, rng):
    bank = SceneBank(bank_path)
    assert bank.n_cases == 248
    ids = rng.integers(0, 300, 17)  # includes wrap-around ids
    E, S = 512, 16
    got = bank.gather(ids, max_edges=E, max_starts=S)
    ref = _npz_ref(ids, E, S)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]),
                                      err_msg=k)
    bank.close()


def test_prefetch_roundtrip(bank_path, rng):
    bank = SceneBank(bank_path)
    ids = rng.integers(0, 248, 64)
    bank.prefetch(ids, max_edges=256, max_starts=8)
    got = bank.take()
    ref = _npz_ref(ids, 256, 8)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]),
                                      err_msg=k)
    # lane is reusable after take()
    bank.prefetch(ids[:4])
    out = bank.take()
    assert out["edges"].shape[0] == 4
    bank.close()


def test_numpy_fallback_matches_native(bank_path, rng, monkeypatch):
    import hope_tpu.native as native

    ids = rng.integers(0, 260, 11)
    nat = SceneBank(bank_path).gather(ids, max_edges=128, max_starts=4)
    monkeypatch.setattr(native, "load_library", lambda: None)
    fb = native.SceneBank(bank_path)
    assert fb._handle is None
    got = fb.gather(ids, max_edges=128, max_starts=4)
    for k in nat:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(nat[k]),
                                      err_msg=k)


def test_streaming_dlp_matches_resident():
    """StreamingDLP (host gather + async prefetch) must produce byte-identical
    reset Scenes to the device-resident DLPDataset for the same keys/ids."""
    import jax
    import jax.numpy as jnp

    from hope_tpu.config import EnvConfig, ObsConfig
    from hope_tpu.envs.dlp import DLPDataset, StreamingDLP

    cfg = EnvConfig(obs=ObsConfig(use_img=False), max_edges=512, max_obstacles=128)
    resident = DLPDataset(env_cfg=cfg)
    stream = StreamingDLP(env_cfg=cfg)
    ids = np.asarray([0, 3, 17, 101])
    keys = jax.random.split(jax.random.PRNGKey(9), len(ids))

    a = resident.batch_reset(keys, jnp.asarray(ids))
    b = stream.batch_reset(keys, ids)
    for field in ("edges", "edge_mask", "edge_poly", "n_polys", "level",
                  "case_id"):
        np.testing.assert_array_equal(np.asarray(getattr(a, field)),
                                      np.asarray(getattr(b, field)),
                                      err_msg=field)
    for field in ("start", "dest", "dest_box", "bounds"):
        # same math, different XLA fusion (big-array indexing vs pre-sliced
        # args) -> 1-ULP float32 differences are expected
        np.testing.assert_allclose(np.asarray(getattr(a, field)),
                                   np.asarray(getattr(b, field)),
                                   rtol=1e-6, atol=1e-6, err_msg=field)

    # prefetch -> take path gives the same scenes as the synchronous gather
    stream.prefetch(ids)
    c, used = stream.take_scenes(keys)
    np.testing.assert_array_equal(used, ids)
    np.testing.assert_array_equal(np.asarray(b.edges), np.asarray(c.edges))
    np.testing.assert_array_equal(np.asarray(b.start), np.asarray(c.start))


def test_scene_pool_stream_dlp_refresh():
    """ScenePool(stream_dlp=True) refreshes through the prefetch lane and
    applies curriculum ids one refresh late (the documented lag)."""
    from hope_tpu.config import EnvConfig, ObsConfig
    from hope_tpu.train.scene_pool import ScenePool

    cfg = EnvConfig(obs=ObsConfig(use_img=False), max_edges=512, max_obstacles=128)
    pool = ScenePool(cfg, per_level=4, include_dlp=True, stream_dlp=True)
    assert pool.stream is not None and pool.dlp is None
    first_ids = np.array(pool.dlp_case_ids)
    assert pool.stream._pending_ids is not None      # next gather in flight

    want = np.asarray([5, 6, 7, 8])
    pool.refresh(dlp_case_ids=want)
    # this refresh consumed the PREVIOUS prefetch (first_ids' choice)...
    np.testing.assert_array_equal(pool.dlp_case_ids, first_ids)
    pool.refresh()
    # ...and the requested ids land on the one after
    np.testing.assert_array_equal(pool.dlp_case_ids, want)
