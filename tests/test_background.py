"""ops/background device kernel vs the host SExtractor oracle, and the
run_zstack front door (BASELINE.json config 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.api import Pipeline
from fluorosequencingimageanalysis_tpu.models.detect import \
    find_peptides_batch
from fluorosequencingimageanalysis_tpu.ops.background import (
    pairwise_zoom_bases, reflect_window_index, stack_background,
    stack_background_jit, subtract_background_stack)
from fluorosequencingimageanalysis_tpu.parallel.mesh import make_mesh
from fluorosequencingimageanalysis_tpu.pipeline.spots import _mesh_background


def _field(rng, H, W, n_spots=20, base=500.0):
    yy, xx = np.mgrid[:H, :W]
    img = (base + 0.5 * yy + 0.3 * xx + 30 * np.sin(yy / 17.0)
           + rng.normal(0, 5, (H, W)))
    for _ in range(n_spots):
        h, w = rng.integers(2, H - 2), rng.integers(2, W - 2)
        img[h - 1:h + 2, w - 1:w + 2] += rng.uniform(100, 2000)
    return img


@pytest.mark.parametrize("shape,box,filt", [
    ((128, 128), 10, 10),   # the reference sextractor defaults' regime
    ((97, 113), 8, 3),      # non-divisible dims, small odd filter
    ((64, 64), 64, 10),     # single box per axis (constant background)
    ((40, 40), 10, 2),      # even filter size (scipy rank m//2 semantics)
    ((16, 16), 20, 10),     # box larger than the image
])
def test_device_background_matches_host_oracle(shape, box, filt):
    rng = np.random.default_rng(7)
    img = _field(rng, *shape)
    host = _mesh_background(img, box, filt)
    dev = np.asarray(stack_background(img.astype(np.float32), box, filt))
    scale = max(1.0, np.abs(host).max())
    assert np.abs(host - dev).max() / scale < 5e-5


def test_device_background_float64_matches_oracle_tightly():
    """x64 is on in the test conftest: f64 input keeps f64 compute on
    device, so the sigma-clip / crowded-box threshold DECISIONS are
    identical to the host oracle's and only summation-order noise
    remains."""
    rng = np.random.default_rng(19)
    img = _field(rng, 128, 128)
    host = _mesh_background(img, 10, 10)
    dev = np.asarray(stack_background(img, 10, 10))
    assert dev.dtype == np.float64
    assert np.abs(host - dev).max() / max(1.0, np.abs(host).max()) < 1e-9


def test_run_zstack_psfs_requires_safe_consolidation_radius():
    from fluorosequencingimageanalysis_tpu.config import (DetectConfig,
                                                          PipelineConfig)
    pipe = Pipeline(PipelineConfig(detect=DetectConfig(
        consolidation_radius=1.5)), mesh=make_mesh(1))
    with pytest.raises(ValueError, match="consolidation_radius"):
        pipe.run_zstack(np.zeros((2, 32, 32), np.float32), psfs=True)


def test_device_background_fuzz_random_shapes_and_params():
    """Randomized sweep: shapes, box/filter sizes, background scales and
    outlier densities drawn per seed, device vs host oracle every time."""
    for seed in range(10):
        rng = np.random.default_rng(1000 + seed)
        H = int(rng.integers(16, 160))
        W = int(rng.integers(16, 160))
        box = int(rng.integers(4, 33))
        filt = int(rng.integers(1, 12))
        base = float(rng.uniform(50, 5000))
        img = _field(rng, H, W, n_spots=int(rng.integers(0, 40)), base=base)
        host = _mesh_background(img, box, filt)
        dev = np.asarray(stack_background(img.astype(np.float32), box, filt))
        scale = max(1.0, np.abs(host).max())
        err = np.abs(host - dev).max() / scale
        assert err < 5e-5, (seed, H, W, box, filt, err)


def test_stack_background_batches_and_single_image_agree():
    rng = np.random.default_rng(11)
    stack = np.stack([_field(rng, 96, 96) for _ in range(5)])
    batched = np.asarray(stack_background(stack, 10, 10))
    singles = np.stack([np.asarray(stack_background(f, 10, 10))
                        for f in stack])
    np.testing.assert_array_equal(batched, singles)
    assert batched.shape == stack.shape


def test_stack_background_mesh_sharded_equals_unsharded():
    rng = np.random.default_rng(13)
    # T=5 is deliberately ragged against the 8-device mesh (pad path).
    stack = np.stack([_field(rng, 64, 64) for _ in range(5)])
    base = np.asarray(stack_background(stack, 10, 4))
    sharded = np.asarray(stack_background(stack, 10, 4, mesh=make_mesh(8)))
    np.testing.assert_allclose(sharded, base, rtol=1e-6, atol=1e-4)
    assert sharded.shape == stack.shape


def test_reflect_window_matches_scipy_median_filter():
    from scipy.ndimage import median_filter
    rng = np.random.default_rng(3)
    for n, k in [(9, 2), (9, 3), (7, 4), (12, 5), (5, 5)]:
        m = rng.normal(size=(n, n))
        ih = reflect_window_index(n, k)
        wins = m[ih[:, :, None, None],
                 ih.T[None, None, :, :].transpose(0, 1, 3, 2)]
        # [n, k, n, k] -> [n, n, k*k]
        wins = wins.transpose(0, 2, 1, 3).reshape(n, n, k * k)
        ours = np.sort(wins, axis=-1)[..., (k * k) // 2]
        np.testing.assert_array_equal(ours, median_filter(m, size=k))


def test_pairwise_zoom_bases_match_host_zoom():
    """Factor extraction reproduces the host zoom branch exactly across
    equal-order, mixed-order, single-box, and strip meshes. (The builder
    itself asserts a random-mesh probe to 1e-10 at construction — this
    pins an independent mesh per shape too.)"""
    from scipy.ndimage import zoom
    rng = np.random.default_rng(5)
    for nh, nw, box in [(7, 7, 10), (2, 4, 28), (4, 4, 10), (1, 5, 6),
                        (1, 1, 10), (3, 2, 4)]:
        Ah, Aw = pairwise_zoom_bases(nh, nw, box)
        mesh = rng.normal(size=(nh, nw))
        oh, ow = min(3, nh - 1), min(3, nw - 1)
        if oh == ow:
            want = zoom(mesh, box, order=oh, mode="reflect",
                        grid_mode=True)
        else:
            want = zoom(mesh, (1.0, float(box)), order=ow, mode="reflect",
                        grid_mode=True)
            want = zoom(want, (float(box), 1.0), order=oh, mode="reflect",
                        grid_mode=True)
        got = Ah @ mesh @ Aw.T
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_subtract_background_stack_device_resident():
    rng = np.random.default_rng(17)
    stack = np.stack([_field(rng, 64, 64) for _ in range(3)])
    sub = subtract_background_stack(stack, 10, 10)
    bg = np.asarray(stack_background(stack, 10, 10))
    np.testing.assert_allclose(np.asarray(sub),
                               stack.astype(np.float32) - bg,
                               rtol=1e-6, atol=1e-4)


def _spot_stack(rng, T=4, H=96, W=96, n_spots=12):
    """Frames with a smooth gradient background + planted PSF-like spots
    bright enough to survive background subtraction + detection."""
    from fluorosequencingimageanalysis_tpu.ops.gaussian import gauss2d_image
    yy, xx = np.mgrid[:H, :W]
    stack = np.empty((T, H, W), np.float64)
    for t in range(T):
        img = (800 + 2.0 * yy + 1.2 * xx
               + rng.normal(0, 4, (H, W)))
        for _ in range(n_spots):
            h = rng.integers(8, H - 8)
            w = rng.integers(8, W - 8)
            amp = rng.uniform(900, 1800)
            dy, dx = rng.uniform(-0.3, 0.3, 2)
            g = np.asarray(gauss2d_image(
                jnp.asarray([0.0, amp, float(h + dy), float(w + dx),
                             1.1, 1.2, 0.0], jnp.float64),
                shape=(H, W), dtype=jnp.float64))
            img += g
        stack[t] = img
    return np.round(stack).astype(np.uint16)


def test_run_zstack_matches_host_composition():
    rng = np.random.default_rng(23)
    stack = _spot_stack(rng)
    pipe = Pipeline(mesh=make_mesh(1))
    out = pipe.run_zstack(stack, box_size=16, filter_size=3,
                          return_background=True)
    assert out["keep"].shape[0] == stack.shape[0]
    assert out["keep"].any(), "planted spots must be detected"
    # Host composition: host-oracle background subtraction, then the
    # public batched detector on the subtracted frames.
    host_sub = np.stack([
        f.astype(np.float64) - _mesh_background(f, 16, 3) for f in stack])
    want = find_peptides_batch(
        host_sub.astype(np.float32), max_candidates=1024)
    got = pipe.run_zstack(stack, box_size=16, filter_size=3, psfs=True)
    assert len(got["psfs"]) == stack.shape[0]
    for t, (g, w) in enumerate(zip(got["psfs"], want)):
        assert set(g.keys()) == set(w.keys()), f"frame {t} key mismatch"
        for k in w:
            np.testing.assert_allclose(g[k][:7], w[k][:7],
                                       rtol=5e-3, atol=5e-3)
    # Background maps agree with the host oracle.
    hb = np.stack([_mesh_background(f, 16, 3) for f in stack])
    assert (np.abs(out["background"] - hb).max()
            / max(1.0, np.abs(hb).max())) < 5e-5


def test_run_zstack_mesh_sharded_equals_single_device():
    rng = np.random.default_rng(29)
    stack = _spot_stack(rng, T=3)  # ragged vs 8 devices
    out1 = Pipeline(mesh=make_mesh(1)).run_zstack(stack, box_size=16,
                                                  filter_size=3)
    out8 = Pipeline(mesh=make_mesh(8)).run_zstack(stack, box_size=16,
                                                  filter_size=3)
    assert set(out1) == set(out8)
    np.testing.assert_array_equal(out1["keep"], out8["keep"])
    np.testing.assert_array_equal(out1["cand_count"], out8["cand_count"])
    np.testing.assert_allclose(out1["center_h"], out8["center_h"],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out1["params"], out8["params"],
                               rtol=1e-4, atol=1e-3)


def test_run_zstack_grouped_equals_device_resident_whole():
    """T=11 on a 1-device mesh splits into an 8-frame group + a padded
    tail group; a device-resident stack dispatches whole. Same spots.

    Not bit-equal by construction: XLA lowers reductions differently per
    batch size (threshold mean/std, LM sums), so values match to float
    tolerance — the kept-spot sets and their centers must agree."""
    import jax.numpy as jnp
    rng = np.random.default_rng(37)
    stack = _spot_stack(rng, T=11)
    pipe = Pipeline(mesh=make_mesh(1))
    grouped = pipe.run_zstack(stack, box_size=16, filter_size=3)
    whole = pipe.run_zstack(jnp.asarray(stack), box_size=16, filter_size=3)
    assert set(grouped) == set(whole)
    assert grouped["keep"].shape == whole["keep"].shape
    for t in range(stack.shape[0]):
        gi = np.nonzero(grouped["keep"][t])[0]
        wi = np.nonzero(whole["keep"][t])[0]
        gc = np.sort(np.stack([grouped["center_h"][t, gi],
                               grouped["center_w"][t, gi]], 1), axis=0)
        wc = np.sort(np.stack([whole["center_h"][t, wi],
                               whole["center_w"][t, wi]], 1), axis=0)
        assert gc.shape == wc.shape, f"frame {t}: kept-count mismatch"
        np.testing.assert_allclose(gc, wc, atol=1e-2)


def test_run_zstack_validates_shape():
    pipe = Pipeline(mesh=make_mesh(1))
    with pytest.raises(ValueError):
        pipe.run_zstack(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        pipe.run_zstack(np.zeros((0, 4, 4), np.float32))


def test_run_zstack_store_cache_roundtrip(tmp_path):
    from fluorosequencingimageanalysis_tpu.utils.checkpoint import \
        ArtifactStore
    rng = np.random.default_rng(31)
    stack = _spot_stack(rng, T=2)
    store = ArtifactStore(tmp_path / "store")
    pipe = Pipeline(mesh=make_mesh(1), store=store)
    out1 = pipe.run_zstack(stack, box_size=16, filter_size=3)
    out2 = pipe.run_zstack(stack, box_size=16, filter_size=3)
    for k in out1:
        np.testing.assert_array_equal(out1[k], np.asarray(out2[k]))
