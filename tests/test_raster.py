"""BEV rasterizer: the global even-odd fast path must reproduce the exact
per-polygon oracle on generated scenes (obstacles are disjoint), and basic
content invariants must hold."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.config import EnvConfig, ObsConfig, VehicleConfig
from hope_tpu.envs.scenario_gen import ScenarioConfig, generate_case
from hope_tpu.geometry import pose_to_box
from hope_tpu.geometry.raster import render_bev, render_bev_oracle

OBS = ObsConfig()
VCFG = VehicleConfig()


def _scene(seed, level="Complex"):
    scene, ok = generate_case(jax.random.PRNGKey(seed),
                              ScenarioConfig.for_level(level),
                              env_cfg=EnvConfig())
    assert bool(ok)
    return scene


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_global_parity_matches_exact_procedural(seed):
    scene = _scene(seed)
    corners = jnp.asarray(VCFG.box_corners())
    for t, pose in enumerate([scene.start,
                              (scene.start + scene.dest) / 2.0,
                              scene.dest]):
        vb = pose_to_box(pose, corners)
        new = np.asarray(render_bev(pose, vb, scene.dest_box, scene.edges,
                                    scene.edge_mask, scene.edge_poly,
                                    OBS, VCFG))
        ref = np.asarray(render_bev_oracle(pose, vb, scene.dest_box,
                                           scene.edges, scene.edge_mask,
                                           scene.edge_poly, OBS, VCFG))
        # identical wherever obstacles are disjoint (both paths share the
        # same ray and crossing formulas); the procedural generator DOES
        # overlap obstacles occasionally — even-odd XORs those regions out
        # (<~2% of pixels, the documented "global" mode deviation)
        frac = np.mean(np.any(new != ref, axis=-1))
        assert frac < 0.02, (seed, t, frac)


def test_bev_content_invariants():
    scene = _scene(5, "Normal")
    corners = jnp.asarray(VCFG.box_corners())
    pose = scene.start
    vb = pose_to_box(pose, corners)
    img = np.asarray(render_bev(pose, vb, scene.dest_box, scene.edges,
                                scene.edge_mask, scene.edge_poly, OBS, VCFG))
    # the car (blue) always covers the image center
    n = OBS.img_size
    center = img[n // 2, n // 2]
    np.testing.assert_allclose(center, [30 / 255, 144 / 255, 255 / 255],
                               atol=1e-6)
    # car pixel count ~ car area / pixel area (within a loose band)
    car_px = np.all(np.isclose(img, np.asarray([30, 144, 255]) / 255.0),
                    axis=-1).sum()
    area = (VCFG.front_hang + VCFG.wheel_base + VCFG.rear_hang) * VCFG.width
    expect = area / (OBS.img_res ** 2)
    assert 0.7 * expect < car_px < 1.3 * expect


def test_bev_empty_scene_is_background_plus_car_dest():
    corners = jnp.asarray(VCFG.box_corners())
    pose = jnp.asarray([0.0, 0.0, 0.3])
    vb = pose_to_box(pose, corners)
    dest_box = np.asarray(pose_to_box(jnp.asarray([3.0, 1.0, 0.3]), corners))
    img = np.asarray(render_bev(pose, vb, dest_box,
                                jnp.zeros((8, 4)), jnp.zeros(8, bool),
                                jnp.zeros(8, jnp.int32), OBS, VCFG))
    grey = np.all(np.isclose(img, 150 / 255.0), axis=-1)
    assert not grey.any()      # padded edges never rasterize
    assert (img == 0).all(axis=-1).mean() > 0.5   # mostly background


@pytest.mark.parametrize("case", [0, 57, 133])
def test_global_parity_matches_exact_on_dlp(case):
    """DLP obstacle footprints are disjoint polygons, so the global even-odd
    fast path must reproduce the exact per-polygon rasterization."""
    from hope_tpu.envs.dlp import DLPDataset
    from hope_tpu.geometry.raster import render_bev_exact

    cfg = EnvConfig(obs=ObsConfig(use_img=True), max_edges=512,
                    max_obstacles=128)
    ds = DLPDataset(env_cfg=cfg)
    scene = jax.tree.map(
        lambda x: x[0],
        ds.batch_reset(jax.random.split(jax.random.PRNGKey(case), 1),
                       jnp.asarray([case % ds.n_cases])))
    corners = jnp.asarray(VCFG.box_corners())
    for pose in (scene.start, scene.dest):
        vb = pose_to_box(pose, corners)
        fast = np.asarray(render_bev(pose, vb, scene.dest_box, scene.edges,
                                     scene.edge_mask, scene.edge_poly,
                                     OBS, VCFG, 128))
        exact = np.asarray(render_bev_exact(pose, vb, scene.dest_box,
                                            scene.edges, scene.edge_mask,
                                            scene.edge_poly, OBS, VCFG, 128))
        frac = np.mean(np.any(fast != exact, axis=-1))
        assert frac < 0.002, (case, frac)


def test_env_raster_parity_flag():
    """ObsConfig.raster_parity switches the obs render path; both produce the
    same image on a DLP-style disjoint scene."""
    from hope_tpu.envs import ParkingEnv
    from hope_tpu.envs.scenario_gen import generate_bank

    scenes, _ = generate_bank(jax.random.PRNGKey(3), level="Normal", n=2)
    imgs = {}
    for mode in ("exact", "global"):
        env = ParkingEnv(EnvConfig(obs=ObsConfig(use_img=True,
                                                 raster_parity=mode),
                                   max_edges=96, max_obstacles=32))
        _, obs = env.batch_reset(scenes)
        imgs[mode] = np.asarray(obs["img"])
    frac = np.mean(imgs["exact"] != imgs["global"])
    assert frac < 0.02   # identical up to overlap regions


def test_prefilter_polys_identity_when_all_fit():
    """With a budget that fits every in-radius polygon, the prefiltered render
    is IDENTICAL to the full render (whole-polygon drops are parity-safe and
    out-of-radius polygons cannot color any pixel)."""
    from hope_tpu.geometry.raster import prefilter_polys, render_bev_exact

    scene = _scene(1, "Complex")
    corners = jnp.asarray(VCFG.box_corners())
    radius = OBS.img_size * OBS.img_res * np.sqrt(2) / 2 + 1.0
    for pose in (scene.start, scene.dest):
        vb = pose_to_box(pose, corners)
        cx_off = (VCFG.front_hang + VCFG.wheel_base - VCFG.rear_hang) / 2.0
        center = pose[:2] + cx_off * jnp.asarray(
            [jnp.cos(pose[2]), jnp.sin(pose[2])])
        fe, fm, fp = prefilter_polys(center, scene.edges, scene.edge_mask,
                                     scene.edge_poly, budget=96,
                                     radius=radius)
        full = np.asarray(render_bev_exact(
            pose, vb, scene.dest_box, scene.edges, scene.edge_mask,
            scene.edge_poly, OBS, VCFG))
        pre = np.asarray(render_bev_exact(
            pose, vb, scene.dest_box, fe, fm, fp, OBS, VCFG))
        np.testing.assert_array_equal(full, pre)
        # and it actually filters something on this scene
        assert int(np.asarray(fm).sum()) <= int(np.asarray(scene.edge_mask).sum())


def test_prefilter_polys_dlp_budget():
    """DLP scene: a 160-edge budget reproduces the full 512-edge render."""
    from hope_tpu.envs.dlp import DLPDataset
    from hope_tpu.geometry.raster import prefilter_polys, render_bev_exact

    cfg = EnvConfig(obs=ObsConfig(use_img=True), max_edges=512,
                    max_obstacles=128)
    ds = DLPDataset(env_cfg=cfg)
    scene = jax.tree.map(
        lambda x: x[0],
        ds.batch_reset(jax.random.split(jax.random.PRNGKey(5), 1),
                       jnp.asarray([5])))
    corners = jnp.asarray(VCFG.box_corners())
    radius = OBS.img_size * OBS.img_res * np.sqrt(2) / 2 + 1.0
    pose = scene.start
    vb = pose_to_box(pose, corners)
    cx_off = (VCFG.front_hang + VCFG.wheel_base - VCFG.rear_hang) / 2.0
    center = pose[:2] + cx_off * jnp.asarray(
        [jnp.cos(pose[2]), jnp.sin(pose[2])])
    fe, fm, fp = prefilter_polys(center, scene.edges, scene.edge_mask,
                                 scene.edge_poly, budget=160, radius=radius,
                                 max_polys=128)
    full = np.asarray(render_bev_exact(pose, vb, scene.dest_box, scene.edges,
                                       scene.edge_mask, scene.edge_poly,
                                       OBS, VCFG, 128))
    pre = np.asarray(render_bev_exact(pose, vb, scene.dest_box, fe, fm, fp,
                                      OBS, VCFG, 128))
    np.testing.assert_array_equal(full, pre)
    kept = int(np.asarray(fm).sum())
    live = int(np.asarray(scene.edge_mask).sum())
    assert kept < live, (kept, live)   # real reduction on DLP clutter


def test_env_raster_edge_budget_identical_obs():
    """The opt-in env-level prefilter produces bit-identical image obs."""
    from hope_tpu.envs import ParkingEnv
    from hope_tpu.envs.scenario_gen import generate_bank

    scenes, _ = generate_bank(jax.random.PRNGKey(9), level="Complex", n=2)
    imgs = {}
    for budget in (0, 96):
        env = ParkingEnv(EnvConfig(obs=ObsConfig(use_img=True,
                                                 raster_edge_budget=budget),
                                   max_edges=96, max_obstacles=32))
        _, obs = env.batch_reset(scenes)
        imgs[budget] = np.asarray(obs["img"])
    np.testing.assert_array_equal(imgs[0], imgs[96])


def test_prefilter_polys_keeps_enclosing_ring():
    """A polygon that ENCLOSES the image while every edge sits beyond the
    filter radius (a huge boundary ring passed as an obstacle) must be
    force-kept: the even-crossings parity argument only covers polygons the
    ray both enters AND exits, so dropping it would flip inside-parity for
    every pixel (ADVICE r4).  The bbox-contains-center guard sorts it first
    (distance -1), ahead of genuinely near polygons."""
    from hope_tpu.geometry.raster import prefilter_polys, render_bev_exact

    def _square(cx, cy, h):
        c = [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h),
             (cx - h, cy + h)]
        return [[*c[i], *c[(i + 1) % 4]] for i in range(4)]

    # poly 0: ring enclosing everything, all edges ~50 m out (radius ~16 m)
    # poly 1: small obstacle near the car   poly 2: small obstacle 40 m away
    edges = jnp.asarray(_square(0, 0, 50.0) + _square(4.0, 3.0, 1.0)
                        + _square(40.0, 0.0, 1.0), jnp.float32)
    edges = jnp.concatenate([edges, jnp.zeros((4, 4))], axis=0)   # padding
    mask = jnp.asarray([True] * 12 + [False] * 4)
    poly = jnp.asarray([0] * 4 + [1] * 4 + [2] * 4 + [63] * 4)

    pose = jnp.asarray([0.0, 0.0, 0.0])
    vb = pose_to_box(pose, jnp.asarray(VCFG.box_corners()))
    dest_box = pose_to_box(jnp.asarray([5.0, 8.0, 0.0]),
                           jnp.asarray(VCFG.box_corners()))
    cx_off = (VCFG.front_hang + VCFG.wheel_base - VCFG.rear_hang) / 2.0
    center = jnp.asarray([cx_off, 0.0])
    radius = OBS.img_size * OBS.img_res * np.sqrt(2) / 2 + 1.0

    fe, fm, fp = prefilter_polys(center, edges, mask, poly, budget=8,
                                 radius=radius)
    # ring (4, force-kept) + near square (4) fit the budget; far square drops
    assert int(np.asarray(fm).sum()) == 8
    full = np.asarray(render_bev_exact(pose, vb, dest_box, edges, mask, poly,
                                       OBS, VCFG))
    pre = np.asarray(render_bev_exact(pose, vb, dest_box, fe, fm, fp,
                                      OBS, VCFG))
    np.testing.assert_array_equal(full, pre)
    # sanity: the ring really does color every non-car/dest pixel — dropping
    # it would NOT be equivalent (guard is load-bearing, not vacuous)
    fe2 = jnp.where((poly == 0)[:, None], 0.0, edges)
    m2 = mask & (poly != 0)
    without = np.asarray(render_bev_exact(pose, vb, dest_box, fe2, m2, poly,
                                          OBS, VCFG))
    assert (without != full).any()
