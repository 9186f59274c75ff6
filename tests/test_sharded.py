"""Sharded execution on an 8-device virtual CPU mesh vs single-device ops.

Integer outputs (indices, HAND) must be bitwise identical for every mesh
shape; floats allclose (f32 summation order differs across decompositions).
"""

import jax
import numpy as np
import pytest

from descriptools_tpu import oracle
from descriptools_tpu.constants import NODATA
from descriptools_tpu.ops import downslope, flow_distance_index, slope
from descriptools_tpu.parallel import (
    make_mesh,
    sharded_downslope,
    sharded_flow_hand,
    sharded_slope,
    sharded_suite,
)
from descriptools_tpu.pipeline import PipelineConfig
from descriptools_tpu.utils.synthetic import synthetic_basin

PX = 12.5


@pytest.fixture(scope="module")
def basin():
    return synthetic_basin(72, 100, seed=21)


def meshes():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return [make_mesh((2, 4)), make_mesh((4, 2)), make_mesh((1, 8))]


@pytest.mark.parametrize("mesh_idx", [0, 1, 2])
def test_sharded_slope_matches_single(basin, mesh_idx):
    dem, _, _, _ = basin
    mesh = meshes()[mesh_idx]
    got = np.asarray(sharded_slope(dem, PX, mesh))
    want = np.asarray(slope(dem, PX))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mesh_idx", [0, 1, 2])
def test_sharded_flow_matches_single(basin, mesh_idx):
    dem, fdr, river, fac = basin
    mesh = meshes()[mesh_idx]
    fdist, indices, hand, river_fac = sharded_flow_hand(
        dem.astype(np.int32), fdr, river, fac.astype(np.int32), PX, mesh
    )
    want_d, want_i = oracle.flow_distance_index_oracle(fdr, river, PX)
    want_h = oracle.hand_oracle(dem.astype(np.int32), want_i)
    want_rf = oracle.river_accumulation_oracle(fac.astype(np.int32), want_i)
    np.testing.assert_array_equal(np.asarray(indices), want_i)
    np.testing.assert_array_equal(np.asarray(hand), want_h)
    np.testing.assert_allclose(np.asarray(fdist), want_d, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(river_fac), want_rf, rtol=1e-6)


@pytest.mark.parametrize("engine,mesh_idx", [
    ("pallas", 0), ("pallas", 2), ("pallas_blocked", 0),
])
def test_sharded_flow_pallas_engine_bitwise(basin, engine, mesh_idx):
    """The Pallas walk tiers under shard_map (interpret mode on CPU) must be
    bitwise on integers vs the oracle, like the XLA local phase — both the
    VMEM-resident tier and the halo-blocked HBM tier."""
    dem, fdr, river, fac = basin
    mesh = meshes()[mesh_idx]
    fdist, indices, hand, _ = sharded_flow_hand(
        dem.astype(np.int32), fdr, river, fac.astype(np.int32), PX, mesh,
        engine=engine, interpret=True,
    )
    want_d, want_i = oracle.flow_distance_index_oracle(fdr, river, PX)
    np.testing.assert_array_equal(np.asarray(indices), want_i)
    np.testing.assert_array_equal(
        np.asarray(hand), oracle.hand_oracle(dem.astype(np.int32), want_i)
    )
    np.testing.assert_allclose(np.asarray(fdist), want_d, rtol=1e-4, atol=1e-2)


def test_sharded_flow_uneven_pad(basin):
    # 72x100 over a (4,2)? already even; force padding with an odd grid.
    dem, fdr, river, fac = synthetic_basin(45, 53, seed=5)
    mesh = make_mesh((2, 4))
    fdist, indices, hand, _ = sharded_flow_hand(
        dem.astype(np.int32), fdr, river, fac.astype(np.int32), PX, mesh
    )
    want_d, want_i = oracle.flow_distance_index_oracle(fdr, river, PX)
    np.testing.assert_array_equal(np.asarray(indices), want_i)
    np.testing.assert_array_equal(
        np.asarray(hand), oracle.hand_oracle(dem.astype(np.int32), want_i)
    )


@pytest.mark.parametrize("mesh_idx", [0, 2])
def test_sharded_downslope_matches_single(basin, mesh_idx):
    dem, fdr, _, _ = basin
    mesh = meshes()[mesh_idx]
    # Steep synthetic terrain: walks stop well within the halo.
    got = np.asarray(sharded_downslope(dem, fdr, PX, 5.0, mesh, halo=16))
    want = np.asarray(downslope(dem.astype(np.float32), fdr, PX, 5.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _gentle_east_basin(rows, cols):
    """Integer DEM with a quadratic eastward profile: the gradient varies
    along the path, so a truncated walk's partial ratio differs from the
    full walk's — and with a large elevation threshold walks run 50-200
    cells east, far past any halo."""
    prof = np.round((cols - np.arange(cols, dtype=np.float64)) ** 2 / 50.0)
    dem = 500.0 + prof * np.ones((rows, 1))
    fdr = np.full((rows, cols), 1, np.uint8)  # all east
    return dem, fdr


@pytest.mark.parametrize("mesh_idx", [0, 1, 2])
def test_sharded_downslope_exact_past_halo(mesh_idx):
    """Walks 100+ cells long with halo=8: the truncation-retry loop must
    widen the halo (multi-hop exchange on narrow blocks) and land bitwise
    on the single-device result — the reference's exactness guarantee
    (downslope.py:373-374)."""
    dem, fdr = _gentle_east_basin(48, 256)
    mesh = meshes()[mesh_idx]
    got = np.asarray(
        sharded_downslope(dem, fdr, PX, 100.0, mesh, halo=8)
    )
    want = np.asarray(downslope(dem.astype(np.float32), fdr, PX, 100.0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mesh_idx", [0, 2])
def test_sharded_downslope_pallas_engine_bitwise(basin, mesh_idx):
    """The VMEM Pallas downslope as the local phase under shard_map
    (interpret mode on CPU) must match the single-device engine bitwise,
    like the XLA local phase (round-2 verdict, item 6)."""
    dem, fdr, _, _ = basin
    mesh = meshes()[mesh_idx]
    got = np.asarray(sharded_downslope(
        dem, fdr, PX, 5.0, mesh, halo=16, engine="pallas", interpret=True,
    ))
    want = np.asarray(downslope(dem.astype(np.float32), fdr, PX, 5.0))
    np.testing.assert_array_equal(got, want)


def test_sharded_downslope_pallas_trunc_retry_bitwise():
    """Pallas local phase + the truncation-retry loop: walks far past the
    halo must converge to the single-device result bitwise via the
    double-offset trunc flags the kernel threads through."""
    dem, fdr = _gentle_east_basin(48, 256)
    mesh = make_mesh((1, 8))
    got = np.asarray(sharded_downslope(
        dem, fdr, PX, 100.0, mesh, halo=8, engine="pallas", interpret=True,
    ))
    want = np.asarray(downslope(dem.astype(np.float32), fdr, PX, 100.0))
    np.testing.assert_array_equal(got, want)


def test_staged_array_on_wrong_mesh_rejected(basin):
    """An array staged on a different mesh must fail loudly, not silently
    decompose wrongly (round-2 verdict, weak #5)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    dem, _, _, _ = basin
    mesh_a, mesh_b = make_mesh((2, 4)), make_mesh((4, 2))
    staged = jax.device_put(
        jnp.asarray(dem, jnp.float32), NamedSharding(mesh_a, P("y", "x"))
    )
    with pytest.raises(ValueError, match="mesh"):
        sharded_slope(staged, PX, mesh_b, shape=dem.shape)


def test_sharded_downslope_exact_heuristic_would_diverge():
    """Sanity: the fixed-halo heuristic (exact=False) DOES diverge on the
    long-flat-walk basin, proving the exact loop is doing real work."""
    dem, fdr = _gentle_east_basin(48, 256)
    mesh = make_mesh((1, 8))
    heur = np.asarray(
        sharded_downslope(dem, fdr, PX, 100.0, mesh, halo=8, exact=False)
    )
    want = np.asarray(downslope(dem.astype(np.float32), fdr, PX, 100.0))
    assert not np.allclose(heur, want)


def test_sharded_suite_runs(basin):
    dem, fdr, river, fac = basin
    mesh = make_mesh((2, 4))
    out = sharded_suite(
        dem.astype(np.int32), fdr, fac.astype(np.int32), river,
        PipelineConfig(), mesh,
    )
    assert set(out) >= {"slope", "twi", "mod_twi", "downslope", "fdist",
                        "indices", "hand", "gfi", "ln_hl_h"}
    want_d, want_i = oracle.flow_distance_index_oracle(fdr, river, PX)
    np.testing.assert_array_equal(np.asarray(out["indices"]), want_i)
    # GFI via payload == GFI via global gather oracle
    hand = oracle.hand_oracle(dem.astype(np.int32), want_i)
    rfac = oracle.river_accumulation_oracle(fac.astype(np.int32), want_i)
    np.testing.assert_allclose(
        np.asarray(out["gfi"]), oracle.gfi_oracle(hand, rfac, 0.4, 0.1, PX),
        rtol=2e-5, atol=1e-3,
    )
