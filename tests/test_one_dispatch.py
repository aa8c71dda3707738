"""One-dispatch 2D inference (infer/inference2d.py one_dispatch=True):
the whole image set scanned through the forward in ONE jit must reproduce
the serial per-image path exactly — same affinities, same decode, same
metrics (the dispatch pattern is the only change)."""

import numpy as np
import pytest

import h5py

from pixel_embedded_affinity_tpu.config import load_config

pytestmark = pytest.mark.slow


def _compare_h5(dir_a, dir_b):
    for name in ("seg.hdf", "affs.hdf"):
        with h5py.File(f"{dir_a}/{name}") as fa, \
                h5py.File(f"{dir_b}/{name}") as fb:
            a, b = fa["main"][:], fb["main"][:]
        assert a.shape == b.shape
        if name == "seg.hdf":
            assert np.array_equal(a, b), name
        else:
            np.testing.assert_allclose(a, b, atol=1e-5)


def test_one_dispatch_matches_serial_cvppp(tmp_path):
    import jax

    from pixel_embedded_affinity_tpu.data.cvppp import (synthesize,
                                                        CVPPPValidation)
    from pixel_embedded_affinity_tpu.infer import run_inference_2d
    from pixel_embedded_affinity_tpu.train.loop import build_model

    folder = str(tmp_path / "CVPPP")
    synthesize(folder, n_train=4, n_valid=3, h=130, w=120)
    cfg = load_config("cvppp", overrides={
        "data": {"data_folder": folder}})
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.s2d_train = False
    valid = CVPPPValidation(folder, padding=cfg.data.padding,
                            shifts=tuple(cfg.data.shifts),
                            neighbor=cfg.data.neighbor)
    model = build_model(cfg)
    h, w = valid[0]["image"].shape[:2]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)

    r_ser, agg_ser = run_inference_2d(cfg, variables, valid,
                                      use_pallas=False,
                                      out_dir=str(tmp_path / "ser"),
                                      save_h5=True)
    r_one, agg_one = run_inference_2d(cfg, variables, valid,
                                      use_pallas=False, one_dispatch=True,
                                      out_dir=str(tmp_path / "one"),
                                      save_h5=True)
    assert len(r_one) == len(r_ser) == 3
    _compare_h5(tmp_path / "ser", tmp_path / "one")
    for k in agg_ser:
        np.testing.assert_allclose(agg_one[k], agg_ser[k], atol=1e-6)


def test_one_dispatch_matches_serial_bbbc(tmp_path):
    """BBBC family: the predicted-mask seeding (mask logits fetched from
    the scan) must match the serial path's decode."""
    import jax

    from pixel_embedded_affinity_tpu.data.bbbc import synthesize, BBBCValidation
    from pixel_embedded_affinity_tpu.infer import run_inference_2d
    from pixel_embedded_affinity_tpu.train.loop import build_model

    folder = str(tmp_path / "bbbc")
    synthesize(folder, n_train=1, n_valid=2, n_test=1, h=180, w=200)
    cfg = load_config("bbbc039v1", overrides={
        "data": {"data_folder": folder, "size": 128}})
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.s2d_train = False

    class SmallValid(BBBCValidation):
        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            for k, sl in (("image", np.s_[:128, :128]),
                          ("seg", np.s_[:128, :128]),
                          ("affs", np.s_[:, :128, :128]),
                          ("wmap", np.s_[:, :128, :128]),
                          ("mask", np.s_[:, :128, :128])):
                s[k] = s[k][sl]
            return s

    valid = SmallValid(folder, shifts=tuple(cfg.data.shifts),
                       neighbor=cfg.data.neighbor)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(1),
                           np.zeros((1, 128, 128, 3), np.float32),
                           train=False)

    r_ser, agg_ser = run_inference_2d(cfg, variables, valid,
                                      use_pallas=False,
                                      out_dir=str(tmp_path / "ser"),
                                      save_h5=True)
    r_one, agg_one = run_inference_2d(cfg, variables, valid,
                                      use_pallas=False, one_dispatch=True,
                                      out_dir=str(tmp_path / "one"),
                                      save_h5=True)
    assert len(r_one) == len(r_ser) == 2
    _compare_h5(tmp_path / "ser", tmp_path / "one")
    for k in agg_ser:
        np.testing.assert_allclose(agg_one[k], agg_ser[k], atol=1e-6)


def test_one_dispatch_matches_serial_cvppp_test_mode(tmp_path):
    """Test-mode (FG-given) path: one-dispatch submission must be
    byte-identical to the serial one."""
    import jax
    import h5py

    from pixel_embedded_affinity_tpu.data.cvppp import synthesize, CVPPPTest
    from pixel_embedded_affinity_tpu.infer.inference2d import run_cvppp_test
    from pixel_embedded_affinity_tpu.train.loop import build_model

    folder = str(tmp_path / "CVPPP")
    synthesize(folder, n_train=2, n_valid=1, n_test=3, h=114, w=84)
    cfg = load_config("cvppp", overrides={
        "data": {"data_folder": folder}})
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.s2d_train = False
    ds = CVPPPTest(folder)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), ds[0]["image"][None],
                           train=False)
    out_ser = str(tmp_path / "ser.h5")
    out_one = str(tmp_path / "one.h5")
    segs_s, names_s = run_cvppp_test(cfg, variables, ds, out_ser,
                                     use_pallas=False)
    segs_o, names_o = run_cvppp_test(cfg, variables, ds, out_one,
                                     use_pallas=False, one_dispatch=True)
    assert names_o == names_s
    for a, b in zip(segs_s, segs_o):
        assert np.array_equal(a, b)
    with h5py.File(out_ser) as fa, h5py.File(out_one) as fb:
        for name in names_s:
            assert np.array_equal(fa[f"A1/{name}/label"][:],
                                  fb[f"A1/{name}/label"][:])


def test_fast_serving_graph_matches_slow_cvppp(tmp_path):
    """The B=1-specialized serving graph (fullres-head fast forward +
    pure-XLA small-batch affinity, ``use_pallas=True``) must reproduce the
    plain Flax + roll-affinity path's decode on both dispatch patterns.
    Runs entirely on CPU now that the serving affinity is pure XLA
    (ops/emb2aff.py::affinity_2d_small_batch; docs/profile_b1_final.py).
    Shapes chosen so the padded 144x160 image passes the %16 s2d gate."""
    import jax

    from pixel_embedded_affinity_tpu.data.cvppp import (synthesize,
                                                        CVPPPValidation)
    from pixel_embedded_affinity_tpu.infer import run_inference_2d
    from pixel_embedded_affinity_tpu.train.loop import build_model

    folder = str(tmp_path / "CVPPP")
    synthesize(folder, n_train=4, n_valid=3, h=130, w=116)
    cfg = load_config("cvppp", overrides={"data": {"data_folder": folder}})
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.s2d_train = False
    valid = CVPPPValidation(folder, padding=cfg.data.padding,
                            shifts=tuple(cfg.data.shifts),
                            neighbor=cfg.data.neighbor)
    model = build_model(cfg)
    h, w = valid[0]["image"].shape[:2]
    assert h % 16 == 0 and w % 16 == 0  # the fast path must engage
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)

    _, agg_slow = run_inference_2d(cfg, variables, valid, use_pallas=False,
                                   out_dir=str(tmp_path / "slow"),
                                   save_h5=True)
    _, agg_fast = run_inference_2d(cfg, variables, valid, use_pallas=True,
                                   one_dispatch=False,
                                   out_dir=str(tmp_path / "fast"),
                                   save_h5=True)
    _, agg_fast1 = run_inference_2d(cfg, variables, valid, use_pallas=True,
                                    one_dispatch=True,
                                    out_dir=str(tmp_path / "fast1"),
                                    save_h5=True)
    _compare_h5(tmp_path / "slow", tmp_path / "fast")
    _compare_h5(tmp_path / "fast", tmp_path / "fast1")
    for k in agg_slow:
        np.testing.assert_allclose(agg_fast[k], agg_slow[k], atol=1e-6)
        np.testing.assert_allclose(agg_fast1[k], agg_slow[k], atol=1e-6)
