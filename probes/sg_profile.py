"""Host-side profiling for the planned 'sg' (scatter-gather window) layout.

For each scattered-regime suite matrix, simulate the sg packing:
  - group = 1024 rows, block sigma = 8 per group (128 rows each), lane = row%128
  - per block: entries sorted by column, greedily packed into (8,128) tiles
    with the constraint "one entry per (tile, lane)" (lane = dest row lane)
  - per (tile, sigma) cell: window = [min slab, max slab] of its entries

Reports T (tiles/group), V (window span) distributions, padding, and a
modeled GFLOPS under (a) per-tile dynamic V and (b) bin-static V, to decide
the kernel's loop structure before writing any Pallas code.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.models import synthetic as syn

LANES, SUBLANES, GR = 128, 8, 1024
VREG = 2.6e-10
BW = 300e9


def pack_block(cols):
    """cols: column-sorted entry columns of one (block) 128-row lane-class...
    Actually needs (lane, col) pairs. Returns tile assignment per entry."""
    raise NotImplementedError


def assign_tiles(lane, grank):
    """Greedy exact: entries already in processing order; entry -> tile =
    max(next free tile of its lane, running frontier). Vectorized fixpoint:
    t = max(krank_within_lane, within_block_rank//128), then bump
    same-(lane,t) collisions until none. ``grank`` = within-block rank."""
    n = lane.size
    # krank = occurrence index within lane (entries already ordered)
    sidx = np.lexsort((np.arange(n), lane))
    occ = np.zeros(n, np.int64)
    ls = lane[sidx]
    new = np.ones(n, bool)
    new[1:] = ls[1:] != ls[:-1]
    run_id = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    occ[sidx] = np.arange(n) - starts[run_id]
    krank = occ
    t = np.maximum(krank, grank // 128)
    iters = 0
    while True:
        iters += 1
        key = lane * (t.max() + 2) + t
        sidx = np.lexsort((np.arange(n), key))
        ks = key[sidx]
        new = np.ones(n, bool)
        new[1:] = ks[1:] != ks[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        bump = np.arange(n) - starts[run_id]
        if not bump.any() or iters > 200:
            break
        tb = t.copy()
        tb[sidx] = t[sidx] + bump
        t = tb
    return t, iters


def profile(name, coo, sample_groups=None):
    t0 = time.time()
    csr = CSRMatrix.from_coo(coo)
    M, N, nnz = csr.nrows, csr.ncols, csr.nnz
    # heavy-row split as the harness does
    csr, seg = csr.split_heavy_rows(256)
    M2 = csr.nrows
    rows = csr.row_ids().astype(np.int64)
    cols = csr.col_idx.astype(np.int64)
    g = rows // GR
    sig = (rows % GR) // LANES
    lane = rows % LANES
    blk = rows // LANES  # global block id
    ngroups = -(-M2 // GR)
    nblk = ngroups * SUBLANES

    if sample_groups:
        keep = g < sample_groups
        rows, cols, gx, sig, lane, blk = rows[keep], cols[keep], g[keep], sig[keep], lane[keep], blk[keep]
        g = gx
        ngroups = min(ngroups, sample_groups)

    slab = cols >> 7
    # per-block processing, vectorized across all blocks via ordering key
    # order entries by (block, col)
    order = np.lexsort((cols, blk))
    blk_o, lane_o, slab_o = blk[order], lane[order], slab[order]
    # global rank within block
    new = np.ones(blk_o.size, bool)
    new[1:] = blk_o[1:] != blk_o[:-1]
    starts = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    within = np.arange(blk_o.size) - starts[run_id]

    # assign tiles per block: use composite key so assign_tiles works globally:
    # lane' = blk * 128 + lane ; order key = within-block rank (already sorted)
    lane_g = blk_o * LANES + lane_o
    t_assign, iters = assign_tiles(lane_g, within)
    # per (block, t, ) window stats
    cell = (blk_o * (t_assign.max() + 1) + t_assign)
    u, inv = np.unique(cell, return_inverse=True)
    vmin = np.full(u.size, 2**62)
    vmax = np.zeros(u.size, np.int64)
    np.minimum.at(vmin, inv, slab_o)
    np.maximum.at(vmax, inv, slab_o)
    span = vmax - vmin + 1
    cnt = np.bincount(inv)
    # per-block T
    Tb = np.zeros(nblk, np.int64)
    np.maximum.at(Tb, blk_o, t_assign + 1)
    Tg = Tb.reshape(ngroups, SUBLANES).max(axis=1)
    # per-group V (max over cells of its blocks)
    cell_blk = u // (t_assign.max() + 1)
    Vg = np.zeros(ngroups, np.int64)
    np.maximum.at(Vg, cell_blk // SUBLANES, span)

    nnz_used = blk_o.size
    slots = int(Tg.sum()) * GR
    # modeled cost, per-tile dynamic V: tile (g,t) pass count = max span over
    # its 8 (block, t) cells, chunked by 8
    tmax = int(t_assign.max()) + 1
    tile_key = (cell_blk // SUBLANES) * tmax + (u % tmax)
    tu, tinv = np.unique(tile_key, return_inverse=True)
    Vtile = np.zeros(tu.size, np.int64)
    np.maximum.at(Vtile, tinv, span)
    vregs_dyn = float((13 * (-(-Vtile // 8)) * 8 + 8).sum())
    vregs_static = float((Tg * (13 * Vg + 8)).sum())
    vol = slots * 8
    sec_dyn = max(vregs_dyn * VREG, vol / BW)
    sec_static = max(vregs_static * VREG, vol / BW)
    gf_dyn = 2 * nnz / sec_dyn / 1e9
    gf_static = 2 * nnz / sec_static / 1e9
    pct = lambda a, q: int(np.percentile(a, q)) if a.size else 0
    print(f"\n=== {name}: M={M} N={N} nnz={nnz} (split rows {M2-M if seg is not None else 0}) "
          f"groups={ngroups} pack_iters={iters} [{time.time()-t0:.1f}s]")
    print(f"  T/group: p50={pct(Tg,50)} p90={pct(Tg,90)} p99={pct(Tg,99)} max={Tg.max()}")
    print(f"  V/cell : p50={pct(span,50)} p90={pct(span,90)} p99={pct(span,99)} max={span.max()}")
    print(f"  V/group: p50={pct(Vg,50)} p90={pct(Vg,90)} p99={pct(Vg,99)} max={Vg.max()}")
    print(f"  fill={nnz_used/max(slots,1):.3f} padding={slots/max(nnz_used,1):.2f}x  slots={slots}")
    print(f"  modeled GF: dynamicV={gf_dyn:.1f}  staticV(group)={gf_static:.1f}")
    # outlier-split estimate: entries in cells with span>48 -> 'far' structure
    far = span > 48
    far_entries = int(cnt[far].sum())
    print(f"  cells span>48: {int(far.sum())}/{u.size} holding {far_entries} entries ({far_entries/nnz_used*100:.1f}%)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["powerlaw", "road", "uniform", "dense"]
    if "powerlaw" in which:
        profile("powerlaw_web", syn.power_law(1_000_000, 3, seed=6))
    if "road" in which:
        profile("road_like", syn.road_network(1_000_000, seed=5))
    if "uniform" in which:
        profile("random_uniform", syn.random_general(200_000, 200_000, 2.5e-4, seed=8))
    if "dense" in which:
        profile("dense_rows_mix", syn.dense_rows_mix(500_000, seed=7))


def profile_gsm(name, coo, sample_groups=None):
    """Group-slab-major variant: per GROUP (1024 rows), entries sorted by
    slab, packed densely 128/sublane-row; per (tile,sublane) window span.
    Reports the per-cell V distribution (entry-weighted) to see whether
    column skew concentrates most entries in tight windows."""
    csr = CSRMatrix.from_coo(coo)
    nnz0 = csr.nnz
    csr, seg = csr.split_heavy_rows(256)
    rows = csr.row_ids().astype(np.int64)
    cols = csr.col_idx.astype(np.int64)
    g = rows // GR
    slab = cols >> 7
    order = np.lexsort((slab, g))
    g_o, slab_o = g[order], slab[order]
    new = np.ones(g_o.size, bool)
    new[1:] = g_o[1:] != g_o[:-1]
    starts = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    within = np.arange(g_o.size) - starts[run_id]
    cell = g_o * (1 << 24) + within // 128  # (group, sublane-row of 128)
    u, inv = np.unique(cell, return_inverse=True)
    vmin = np.full(u.size, 2**62); vmax = np.zeros(u.size, np.int64)
    np.minimum.at(vmin, inv, slab_o)
    np.maximum.at(vmax, inv, slab_o)
    span = vmax - vmin + 1
    cnt = np.bincount(inv)
    # entry-weighted span percentiles
    w = np.repeat(span, cnt)
    passes = (-(-span // 8) * 8)
    vregs = float((13 * passes + 3).sum()) / 8  # per 8 cells = 1 (8,128) tile... cells ARE sublane rows; tile = 8 cells but V dynamic per cell -> treat per-cell pass on (1,128)? kernel does (8,128) tiles: passes per tile = sum over... conservative: per-tile = max of its 8 cells
    tile = u // 8 + (u % (1<<24)) // 8 * 0  # approximate: group tiles = consecutive cells/8
    tkey = g_o * (1 << 24) + (within // 1024)
    tu, tinv = np.unique(tkey, return_inverse=True)
    Vt = np.zeros(tu.size, np.int64)
    np.maximum.at(Vt, tinv, span[inv][...] * 0 + 0)  # placeholder
    # per-tile V = max over entries of (slab - min slab of its cell)... simpler: max span of the 8 cells
    cell_tile = (u % (1 << 24)) // 8 + (u >> 24) * (1 << 20)
    ctu, ctinv = np.unique(cell_tile, return_inverse=True)
    Vtile = np.zeros(ctu.size, np.int64)
    np.maximum.at(Vtile, ctinv, span)
    vregs_tile = float((13 * (-(-Vtile // 8)) * 8 + 10).sum())
    sec = max(vregs_tile * VREG, g_o.size * 8 / BW)
    pct = lambda a, q: int(np.percentile(a, q)) if a.size else 0
    print(f"\n=== GSM {name}: nnz={nnz0}")
    print(f"  V/cell entry-weighted: p50={pct(w,50)} p90={pct(w,90)} p99={pct(w,99)} max={w.max()}")
    print(f"  V/tile: p50={pct(Vtile,50)} p90={pct(Vtile,90)} max={Vtile.max()}  tiles={ctu.size}")
    print(f"  modeled GF (gather only, dyn tile V): {2*nnz0/sec/1e9:.1f}")


if "gsm" in sys.argv:
    profile_gsm("powerlaw_web", syn.power_law(1_000_000, 3, seed=6))
    profile_gsm("random_uniform", syn.random_general(200_000, 200_000, 2.5e-4, seed=8))
