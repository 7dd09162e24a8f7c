"""TPU-hardware checks: rasterizer gradient parity + round-2 perf microbench.

Run ON THE REAL CHIP (not under the CPU-forced test conftest):

    python scripts/tpu_checks.py [parity] [micro] [mlp] [step]

Part `parity` is the hardware gradient-parity test ADVICE.md asked for: the
dead-segment window bug (tiles.py v3 layout) only manifests through Mosaic's
write-out-on-window-change behavior on real TPU — interpret mode read-modify-
writes the backing array and cannot catch it. Scenes are built so the segment
grid contains every dangerous shape: leading dead segments, empty tiles
between live ones, multi-chunk tiles, and shared boundary chunks.

Part `micro` times candidate per-Gaussian gradient-reduction designs (the
round-1 bottleneck: the transpose(gather) scatter-add, docs/NOTES_ROUND1.md).

Part `mlp` times the deform-MLP trunk in f32 vs bf16 activations.

Part `step` reruns the bench.py train-step measurement in this same process.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from freegaussian_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def log(*a):
    print(*a, flush=True)


# ---------------------------------------------------------------------------
# timing helper: on-device lax.scan loop, inputs perturbed by the carry so XLA
# cannot hoist the body out of the loop.
# ---------------------------------------------------------------------------


def bench_fn(name, fn, float_args, int_args=(), iters=20):
    def body(carry, _):
        eps = carry * 1e-30
        args = [
            jax.tree.map(lambda x: x + eps if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
            for a in float_args
        ] + list(int_args)
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
        return carry + s * 1e-30, ()

    @jax.jit
    def run():
        c, _ = jax.lax.scan(body, jnp.asarray(0.0), None, length=iters)
        return c

    r = run()
    jax.block_until_ready(r)
    t0 = time.time()
    r = run()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    log(f"  {name:32s} {dt*1e3:8.3f} ms")
    return dt


# ---------------------------------------------------------------------------
# parity
# ---------------------------------------------------------------------------


def clustered_scene(n=3000, width=256, height=256, seed=0, opac_scale=0.98):
    """Gaussians in two clusters -> many empty tiles (dead segments) incl. the
    top-left tile (leading dead segments before the first live one)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    half = n // 2
    c1 = jax.random.normal(keys[0], (half, 2)) * 14.0 + jnp.array([64.0, 150.0])
    c2 = jax.random.normal(keys[1], (n - half, 2)) * 10.0 + jnp.array([200.0, 80.0])
    means2d = jnp.concatenate([c1, c2], axis=0)
    a = jax.random.uniform(keys[2], (n,), minval=0.05, maxval=0.6)
    c = jax.random.uniform(keys[3], (n,), minval=0.05, maxval=0.6)
    b = jax.random.uniform(keys[4], (n,), minval=-0.5, maxval=0.5) * jnp.sqrt(a * c)
    conics = jnp.stack([a, b, c], axis=-1)
    colors = jax.random.uniform(keys[5], (n, 3))
    opacities = jax.random.uniform(keys[2], (n,)) * opac_scale
    depths = jnp.linspace(1.0, 5.0, n)
    radii = jnp.full((n,), 7, dtype=jnp.int32)
    radii = radii.at[::13].set(0)  # some culled
    return means2d, conics, colors, opacities, depths, radii


def run_parity(tile_size=16):
    from freegaussian_tpu.ops.rasterize_pallas import rasterize_pixels_pallas
    from freegaussian_tpu.ops.rasterize_ref import rasterize_pixels_reference

    ok = True
    for seed, n, wh, tag in [(0, 3000, (256, 256), "clustered"), (3, 900, (64, 64), "dense")]:
        width, height = wh
        args = clustered_scene(n=n, width=width, height=height, seed=seed)
        if tag == "dense":
            # everything in one corner: huge per-tile runs (multi-chunk) plus
            # a fully dead remainder of the segment grid
            m, c, col, op, dep, rad = args
            m = jax.random.uniform(jax.random.PRNGKey(7), (n, 2)) * 40.0
            args = (m, c, col, op * 0.999 / op.max(), dep, rad)
        means2d, conics, colors, opacities, depths, radii = args
        target = jax.random.uniform(jax.random.PRNGKey(9), (height, width, 3))

        def pal(m, c, col, op, dep, rad, w, h):
            # explicit capacity: the oracle never drops intersections
            return rasterize_pixels_pallas(
                m, c, col, op, dep, rad, w, h,
                capacity=16 * n, tile_size=tile_size,
            )

        def loss(fn, m, c, col, op):
            out = fn(m, c, col, op, depths, radii, width, height)
            render, alpha = out[0], out[1]
            return jnp.sum((render - target) ** 2) + 0.3 * jnp.sum(alpha**2)

        t0 = time.time()
        lp, gp = jax.jit(
            jax.value_and_grad(
                lambda m, c, col, op: loss(pal, m, c, col, op),
                argnums=(0, 1, 2, 3),
            )
        )(means2d, conics, colors, opacities)
        jax.block_until_ready(gp)
        log(f"[parity:{tag}] pallas hw compile+run {time.time()-t0:.1f}s")
        lr, gr = jax.jit(
            jax.value_and_grad(
                lambda m, c, col, op: loss(rasterize_pixels_reference, m, c, col, op),
                argnums=(0, 1, 2, 3),
            )
        )(means2d, conics, colors, opacities)
        jax.block_until_ready(gr)
        log(
            f"[parity:{tag}] loss pallas={float(lp):.6f} oracle={float(lr):.6f} "
            f"rel={abs(float(lp)-float(lr))/max(abs(float(lr)),1e-9):.2e}"
        )
        # forward image comparison (localizes fwd-kernel issues)
        r_p, a_p, _ = jax.jit(pal, static_argnums=(6, 7))(
            means2d, conics, colors, opacities, depths, radii, width, height
        )
        r_r, a_r, _ = rasterize_pixels_reference(
            means2d, conics, colors, opacities, depths, radii, width, height
        )
        dimg = np.abs(np.asarray(r_p) - np.asarray(r_r)).max(-1)
        log(
            f"[parity:{tag}] fwd image max|d|={dimg.max():.3e} "
            f"px>1e-4: {(dimg > 1e-4).sum()}/{dimg.size} "
            f"px>1e-2: {(dimg > 1e-2).sum()}"
        )
        da = np.abs(np.asarray(a_p) - np.asarray(a_r))
        log(
            f"[parity:{tag}] fwd alpha max|d|={da.max():.3e} "
            f">1e-4: {(da > 1e-4).sum()}/{da.size}"
        )
        # recompute the loss on host from the fwd outputs: separates fwd
        # divergence from loss-reduction divergence inside the grad jit
        tnp = np.asarray(target)
        for nm, rr, aa in (("pallas", r_p, a_p), ("oracle", r_r, a_r)):
            lh = float(
                np.sum((np.asarray(rr) - tnp) ** 2)
                + 0.3 * np.sum(np.asarray(aa) ** 2)
            )
            log(f"[parity:{tag}] host-recomputed {nm} loss: {lh:.6f}")
        names = ["means2d", "conics", "colors", "opacities"]
        for name, a, b in zip(names, gp, gr):
            a, b = np.asarray(a), np.asarray(b)
            d = np.abs(a - b)
            denom = np.maximum(np.abs(b), 1e-3)
            rel = d / denom
            bad = (d > 5e-4) & (rel > 5e-3)
            # Termination flips: a pixel whose transmittance sits within f32
            # noise of the 1e-4 cutoff composites one more/fewer Gaussian in
            # one backend — that Gaussian's gradient legitimately differs.
            # The same noise shows between compiled and interpret mode of the
            # SAME kernel, so allow a small flip budget; systematic errors
            # (the bugs this test exists for) blow way past it.
            frac = bad.sum() / bad.size
            good = frac <= 0.005
            ok &= bool(good)
            log(
                f"[parity:{tag}] {name:10s} max|d|={d.max():.3e} "
                f"maxrel={np.max(rel):.3e} bad={bad.sum()}/{bad.size} "
                f"{'OK' if good else 'FAIL'}"
            )
    log(f"[parity] {'PASS' if ok else 'FAIL'}")
    return ok


# ---------------------------------------------------------------------------
# micro: per-Gaussian gradient reduction designs
# ---------------------------------------------------------------------------


def run_micro():
    N = 100_000
    CAP = 1 << 19
    D = 16
    rng = np.random.default_rng(0)
    # realistic intersection multiset: avg ~2.6 per gaussian, heavy tail
    counts = np.minimum(rng.geometric(1.0 / 2.6, size=N), 64).astype(np.int32)
    total = int(counts.sum())
    log(f"[micro] N={N} capacity={CAP} D={D} real isects={total}")
    exp_gids = np.repeat(np.arange(N, dtype=np.int32), counts)[:CAP]
    perm_np = rng.permutation(total)[: min(total, CAP)]
    gids = np.full(CAP, N, np.int32)
    gids[: len(perm_np)] = exp_gids[perm_np]  # tile-sort-like random grouping
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    gids = jnp.asarray(gids)
    offsets_j = jnp.asarray(np.minimum(offsets, CAP - 1))
    counts_j = jnp.asarray(counts)
    rows = jnp.asarray(rng.normal(size=(CAP, D)).astype(np.float32))
    # expansion position of each (kept) sorted slot; dropped/padding -> CAP
    exp_pos = np.full(CAP, CAP, np.int32)
    exp_pos[: len(perm_np)] = perm_np
    exp_pos = jnp.asarray(exp_pos)
    iota = jnp.arange(CAP, dtype=jnp.int32)

    def v_scatter_add(rows):
        return jnp.zeros((N + 1, D), jnp.float32).at[gids].add(rows, mode="drop")

    def v_segment_sum(rows):
        return jax.ops.segment_sum(rows, gids, num_segments=N + 1)

    def boundary_diff(cs):
        ends = jnp.clip(offsets_j + counts_j - 1, 0, CAP - 1)
        e = cs[ends]
        s = jnp.where((offsets_j > 0)[:, None], cs[jnp.maximum(offsets_j - 1, 0)], 0.0)
        return jnp.where((counts_j > 0)[:, None], e - s, 0.0)

    def v_sort_gather_cumsum(rows):
        _, order = jax.lax.sort((gids, iota), num_keys=1)
        grouped = rows[order]
        cs = jnp.cumsum(grouped, axis=0)
        return boundary_diff(cs)

    def v_setscatter_cumsum(rows):
        d_exp = jnp.zeros((CAP + 1, D), jnp.float32).at[exp_pos].set(rows, mode="drop")
        cs = jnp.cumsum(d_exp[:CAP], axis=0)
        return boundary_diff(cs)

    def v_intscatter_gather_cumsum(rows):
        inv = jnp.full((CAP + 1,), CAP, jnp.int32).at[exp_pos].set(iota, mode="drop")[:CAP]
        rows_p = jnp.concatenate([rows, jnp.zeros((1, D), jnp.float32)], axis=0)
        grouped = rows_p[jnp.minimum(inv, CAP)]
        cs = jnp.cumsum(grouped, axis=0)
        return boundary_diff(cs)

    def v_gather_only(rows):
        return rows[jnp.asarray(exp_pos) % CAP]

    def v_sort_only(rows):
        k, o = jax.lax.sort((gids, iota), num_keys=1)
        return o.astype(jnp.float32).sum() + rows[0, 0]

    def v_cumsum_only(rows):
        return jnp.cumsum(rows, axis=0)

    def v_setscatter_only(rows):
        return jnp.zeros((CAP + 1, D), jnp.float32).at[exp_pos].set(rows, mode="drop")

    def v_scatter_add_bf16(rows):
        r = rows.astype(jnp.bfloat16)
        return jnp.zeros((N + 1, D), jnp.bfloat16).at[gids].add(r, mode="drop")

    variants = [
        ("scatter_add (status quo)", v_scatter_add),
        ("segment_sum", v_segment_sum),
        ("sort+gather+cumsum+diff", v_sort_gather_cumsum),
        ("setscatter+cumsum+diff", v_setscatter_cumsum),
        ("intscatter+gather+cumsum", v_intscatter_gather_cumsum),
        ("gather rows only", v_gather_only),
        ("sort only", v_sort_only),
        ("cumsum only", v_cumsum_only),
        ("setscatter rows only", v_setscatter_only),
        ("scatter_add bf16", v_scatter_add_bf16),
    ]
    results = {}
    for name, fn in variants:
        try:
            results[name] = bench_fn(name, fn, [rows])
        except Exception as e:  # noqa: BLE001
            log(f"  {name:32s} ERROR {type(e).__name__}: {e}")

    # numerical agreement of the reduction designs
    ref = np.asarray(v_scatter_add(rows))[:N]
    for name, fn in [
        ("sort+gather+cumsum+diff", v_sort_gather_cumsum),
        ("setscatter+cumsum+diff", v_setscatter_cumsum),
        ("intscatter+gather+cumsum", v_intscatter_gather_cumsum),
    ]:
        got = np.asarray(fn(rows))[:N]
        err = np.max(np.abs(got - ref))
        log(f"  agreement {name}: max|d|={err:.3e}")
    return results


# ---------------------------------------------------------------------------
# mlp: deform trunk f32 vs bf16 activations
# ---------------------------------------------------------------------------


def run_evalperf():
    """Inference (serving) throughput: the jitted eval forward at the bench
    operating point — the reference's headline num_rays_per_sec/fps metric
    class (freegaussian_pipeline.py:149-153). Forward only, scan-timed."""
    from freegaussian_tpu.data.cameras import Camera
    from freegaussian_tpu.models.gaussians import init_gaussians
    from freegaussian_tpu.models.splat_model import (
        SplatConfig, forward, make_deform_apply, make_deform_field,
    )

    n_gauss = 100_000
    rng = np.random.default_rng(0)
    seed_xyz = rng.normal(scale=1.0, size=(n_gauss, 3)).astype(np.float32)
    seed_rgb = rng.uniform(0, 255, size=(n_gauss, 3)).astype(np.float32)
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), n_gauss, seed_points=(seed_xyz, seed_rgb), sh_degree=3
    )
    params["scales"] = jnp.full_like(params["scales"], jnp.log(0.015))
    cfg = SplatConfig(warm_up=0, background_color="black", isect_capacity_factor=3)
    deform = make_deform_field(cfg)
    deform_apply = make_deform_apply(cfg, deform)
    dvars = deform.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = 6.0

    # bench leg (2x-downscale CoNeRF point) + native CoNeRF capture res;
    # focal scales with width so the scene is identical (VERDICT r4 #8)
    for width, height in ((640, 480), (1296, 968)):
        focal = 500.0 * width / 640.0
        camera = Camera(
            c2w=jnp.asarray(c2w[:3]), fx=jnp.asarray(focal), fy=jnp.asarray(focal),
            cx=jnp.asarray(width / 2.0), cy=jnp.asarray(height / 2.0),
            time=jnp.asarray(0.5), width=width, height=height,
        )

        def render(t, camera=camera):
            out = forward(
                cfg, params, alive, camera.replace(time=t),
                deform_variables=dvars, deform_apply=deform_apply,
                sh_degree_now=3, warmed_up=jnp.asarray(True), train=False,
            )
            return out["rgb"]

        dt = bench_fn(
            f"eval render fwd {width}x{height}", render, [jnp.asarray(0.5)],
            iters=30,
        )
        log(
            f"eval {width}x{height} rays/s: {width * height / dt:.3e}  "
            f"fps: {1.0 / dt:.1f}"
        )


def run_mlp():
    from freegaussian_tpu.models.fields import DeformField

    N = 100_000
    field = DeformField(is_blender=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 3))
    t = jnp.full((1, 1), 0.5)
    vars32 = field.init(jax.random.PRNGKey(1), x, t)

    def loss32(v, x):
        d_xyz, rot, scale = field.apply(v, x, t)
        return (
            jnp.sum(d_xyz.w) + jnp.sum(d_xyz.v) + jnp.sum(d_xyz.theta)
            + jnp.sum(rot) + jnp.sum(scale)
        )

    g32 = jax.grad(loss32)
    bench_fn("deform f32 fwd", lambda x: loss32(vars32, x), [x])
    bench_fn("deform f32 fwd+bwd", lambda x: jax.tree.leaves(g32(vars32, x))[0], [x])

    vars16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), vars32)
    x16 = x.astype(jnp.bfloat16)

    def loss16(v, x):
        d_xyz, rot, scale = field.apply(v, x.astype(jnp.bfloat16), t.astype(jnp.bfloat16))
        return (
            jnp.sum(d_xyz.w.astype(jnp.float32))
            + jnp.sum(d_xyz.v.astype(jnp.float32))
            + jnp.sum(d_xyz.theta.astype(jnp.float32))
            + jnp.sum(rot.astype(jnp.float32))
            + jnp.sum(scale.astype(jnp.float32))
        )

    g16 = jax.grad(loss16)
    bench_fn("deform bf16 fwd", lambda x: loss16(vars16, x), [x])
    bench_fn("deform bf16 fwd+bwd", lambda x: jax.tree.leaves(g16(vars16, x))[0], [x])


def run_fusedsweep():
    """Backward-block sweep for the fused trunk: the bwd does 3 matmul passes
    per (block, layer) pair at B=512 — likely MXU-pipeline-latency bound;
    bf16 remat buffers should let B=1024/2048 fit VMEM and amortize it."""
    from freegaussian_tpu.models.fields import DeformField, deform_apply_fused

    N = 100_000
    field = DeformField(is_blender=True, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 3))
    t = jnp.full((1, 1), 0.5)
    v = field.init(jax.random.PRNGKey(1), x, t)

    for block in (512, 1024, 2048):
        def loss(v, x, _b=block):
            d_xyz, rot, sc = deform_apply_fused(field, v, x, t, block=_b)
            return (
                jnp.sum(d_xyz.w) + jnp.sum(d_xyz.v) + jnp.sum(d_xyz.theta)
                + jnp.sum(rot) + jnp.sum(sc)
            )

        g = jax.grad(loss)
        try:
            bench_fn(
                f"fused bwd block={block}",
                lambda x, _g=g: jax.tree.leaves(_g(v, x))[0], [x],
            )
        except Exception as e:  # noqa: BLE001
            log(f"  fused bwd block={block}: FAILED {type(e).__name__}: {e}")


def run_fused():
    """Fused Pallas trunk (ops/mlp_pallas.py) vs the flax bf16 field path on
    hardware: full-field output parity + fwd / fwd+bwd timing at N=100k."""
    from freegaussian_tpu.models.fields import DeformField, deform_apply_fused

    N = 100_000
    field = DeformField(is_blender=True, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 3))
    t = jnp.full((1, 1), 0.5)
    v = field.init(jax.random.PRNGKey(1), x, t)

    @jax.jit
    def both(x):
        a = field.apply(v, x, t)
        b = deform_apply_fused(field, v, x, t)
        return a, b

    (a, b) = both(x)
    for name, ra, rb in [
        ("w", a[0].w, b[0].w), ("v", a[0].v, b[0].v),
        ("theta", a[0].theta, b[0].theta),
        ("rot", a[1], b[1]), ("scale", a[2], b[2]),
    ]:
        scale = float(jnp.max(jnp.abs(ra))) + 1e-3
        log(f"fused-vs-flax {name}: rel {float(jnp.max(jnp.abs(ra - rb))) / scale:.2e}")

    def loss_of(apply_fn):
        def loss(v, x):
            d_xyz, rot, sc = apply_fn(v, x, t)
            return (
                jnp.sum(d_xyz.w) + jnp.sum(d_xyz.v) + jnp.sum(d_xyz.theta)
                + jnp.sum(rot) + jnp.sum(sc)
            )
        return loss

    from freegaussian_tpu.ops import mlp_pallas

    variants = [("flax-bf16", field.apply)]
    for blk in (512, 1024):  # 2048 exceeds the 16M scoped-vmem limit in bwd
        variants.append(
            (f"fused-b{blk}", lambda v_, x_, t_, b=blk: deform_apply_fused(
                field, v_, x_, t_, block=b))
        )
    for name, ap in variants:
        l = loss_of(ap)
        g = jax.grad(l)
        bench_fn(f"deform {name} fwd", lambda x: l(v, x), [x])
        bench_fn(
            f"deform {name} fwd+bwd", lambda x: jax.tree.leaves(g(v, x))[0], [x]
        )
    mlp_pallas.FWD_SEMANTICS = "parallel"
    l = loss_of(variants[2][1])
    bench_fn("deform fused-b1024-par fwd", lambda x: l(v, x), [x])
    mlp_pallas.FWD_SEMANTICS = "arbitrary"


def run_fusedmicro():
    """Isolate the fused-trunk slowness: raw trunk (no embed/heads) fused vs
    XLA, and single-matmul Pallas vs XLA dot at the same data volume."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from freegaussian_tpu.ops import mlp_pallas
    from freegaussian_tpu.ops.mlp_pallas import fused_trunk

    N, Hh, B = 102400, 256, 1024
    x63 = jax.random.normal(jax.random.PRNGKey(0), (N, 63))
    t30 = jax.random.normal(jax.random.PRNGKey(1), (1, 30))
    ws, bs = [], []
    dims = [93] + [Hh] * 7
    dims[5] = 93 + Hh
    for i in range(8):
        ws.append(jax.random.normal(jax.random.PRNGKey(10 + i), (dims[i], Hh)) / 16)
        bs.append(jnp.zeros((Hh,)))
    ws, bs = tuple(ws), tuple(bs)

    def raw_fused(x):
        return fused_trunk(x, t30, ws, bs, block=1024)

    def raw_xla(x):
        h = jnp.concatenate([x, jnp.broadcast_to(t30, (N, 30))], axis=-1)
        inp = h
        for i in range(8):
            z = jax.lax.dot_general(
                h.astype(jnp.bfloat16), ws[i].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            h = jax.nn.relu(z + bs[i])
            if i == 4:
                h = jnp.concatenate([inp, h], axis=-1)
        return h

    bench_fn("raw trunk fused b1024", raw_fused, [x63])
    bench_fn("raw trunk xla-chain", raw_xla, [x63])

    xh = jax.random.normal(jax.random.PRNGKey(2), (N, Hh))
    w1 = jax.random.normal(jax.random.PRNGKey(3), (Hh, Hh)) / 16

    def xla_dot(x):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    def _one_mm_kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), w_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    def pallas_dot(x):
        return pl.pallas_call(
            _one_mm_kernel,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((B, Hh), lambda s: (s, 0)),
                pl.BlockSpec((Hh, Hh), lambda s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, Hh), lambda s: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((N, Hh), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )(x, w1.astype(jnp.bfloat16))

    bench_fn("micro xla dot 256x256", xla_dot, [xh])
    bench_fn("micro pallas dot 256x256", pallas_dot, [xh])

    def _chain8_kernel(x_ref, w_ref, o_ref):
        h = x_ref[...].astype(jnp.bfloat16)
        for _ in range(8):
            z = jax.lax.dot_general(
                h, w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            h = jax.nn.relu(z).astype(jnp.bfloat16)
        o_ref[...] = h

    def pallas_chain8(x):
        return pl.pallas_call(
            _chain8_kernel,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((B, Hh), lambda s: (s, 0)),
                pl.BlockSpec((Hh, Hh), lambda s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, Hh), lambda s: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((N, Hh), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )(x, w1.astype(jnp.bfloat16))

    bench_fn("micro pallas chain8 256", pallas_chain8, [xh])

    def _chain8_f32_kernel(x_ref, w_ref, o_ref):
        h = x_ref[...]
        for _ in range(8):
            z = jax.lax.dot_general(
                h, w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            h = jax.nn.relu(z)
        o_ref[...] = h

    def pallas_chain8_f32(x):
        return pl.pallas_call(
            _chain8_f32_kernel,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((B, Hh), lambda s: (s, 0)),
                pl.BlockSpec((Hh, Hh), lambda s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, Hh), lambda s: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((N, Hh), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )(x, w1)

    bench_fn("micro pallas chain8 f32", pallas_chain8_f32, [xh])


def _profile_op_table(tag, fn, args, topk=25):
    """Run fn under jax.profiler.trace and print the top device ops by total
    duration (parsed from the perfetto trace.json.gz — no tensorboard dep)."""
    import shutil

    d = f"/tmp/jaxprof_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    r = fn(*args)
    jax.block_until_ready(r)
    with jax.profiler.trace(d):
        for _ in range(5):
            r = fn(*args)
        jax.block_until_ready(r)
    _print_trace_table(tag, d, iters=5, topk=topk)


def _print_trace_table(tag, d, iters, topk=25):
    import glob
    import gzip
    import json

    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    if not files:
        log(f"[prof {tag}] no trace file found under {d}")
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    # device-side complete events: pid whose name mentions TPU / device
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    dev_pids = {
        p for p, nm in pid_names.items()
        if "TPU" in nm or "tpu" in nm or "Device" in nm or "/device" in nm
    }
    agg = {}
    for e in trace["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:topk]
    log(f"[prof {tag}] top ops (us per iter over {iters} iters):")
    for name, us in items:
        log(f"    {us/iters:10.1f} us  {name[:90]}")


def run_fusedprof():
    from freegaussian_tpu.models.fields import DeformField, deform_apply_fused

    N = 100_000
    field = DeformField(is_blender=True, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 3))
    t = jnp.full((1, 1), 0.5)
    v = field.init(jax.random.PRNGKey(1), x, t)

    def total(out):
        d_xyz, rot, sc = out
        return (
            jnp.sum(d_xyz.w) + jnp.sum(d_xyz.v) + jnp.sum(d_xyz.theta)
            + jnp.sum(rot) + jnp.sum(sc)
        )

    f_flax = jax.jit(lambda x: total(field.apply(v, x, t)))
    f_fused = jax.jit(lambda x: total(deform_apply_fused(field, v, x, t)))
    _profile_op_table("flax", f_flax, [x])
    _profile_op_table("fused", f_fused, [x])


def run_xinterp():
    """Compiled vs interpret mode for the SAME pallas path on the same chip:
    isolates hardware-kernel miscompiles from algorithm/oracle differences."""
    import functools

    from freegaussian_tpu.ops.rasterize_pallas import rasterize_pixels_pallas

    n, width, height = 400, 64, 64
    args = clustered_scene(n=n, width=width, height=height, seed=1)
    m, c, col, op, dep, rad = args
    m = jax.random.uniform(jax.random.PRNGKey(2), (n, 2)) * jnp.array(
        [width, height]
    )
    args = (m, c, col, op, dep, rad)
    target = jax.random.uniform(jax.random.PRNGKey(9), (height, width, 3))

    def loss(interp, m, c, col, op):
        render, alpha, _ = rasterize_pixels_pallas(
            m, c, col, op, args[4], args[5], width, height,
            capacity=16 * n, interpret=interp,
        )
        return jnp.sum((render - target) ** 2) + 0.3 * jnp.sum(alpha**2)

    for interp in (False, True):
        t0 = time.time()
        l, g = jax.jit(
            jax.value_and_grad(
                functools.partial(loss, interp), argnums=(0, 1, 2, 3)
            )
        )(*args[:4])
        jax.block_until_ready(g)
        log(f"[xinterp] interpret={interp} loss={float(l):.6f} ({time.time()-t0:.0f}s)")
        if not interp:
            base_l, base_g = l, g
        else:
            for name, a, b in zip(["means2d", "conics", "colors", "opac"], base_g, g):
                d = np.abs(np.asarray(a) - np.asarray(b))
                log(
                    f"[xinterp] {name:8s} max|d|={d.max():.3e} "
                    f"n>1e-4: {(d > 1e-4).sum()}/{d.size}"
                )
            log(f"[xinterp] loss delta rel={abs(float(base_l)-float(l))/max(abs(float(l)),1e-9):.3e}")


def run_profile():
    """Phase-level timing at the bench operating point (100k Gaussians,
    640x480): where does the train step's time actually go now?"""
    from freegaussian_tpu.data.cameras import Camera
    from freegaussian_tpu.models.gaussians import init_gaussians
    from freegaussian_tpu.models.splat_model import SplatConfig, make_deform_field
    from freegaussian_tpu.ops.projection import project_gaussians
    from freegaussian_tpu.ops.rasterize_pallas import rasterize_pixels_pallas
    from freegaussian_tpu.ops.tiles import build_intersections_segments
    from freegaussian_tpu.models.ssim import ssim

    n_gauss, width, height = 100_000, 640, 480
    rng = np.random.default_rng(0)
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), n_gauss,
        seed_points=(rng.normal(scale=1.0, size=(n_gauss, 3)).astype(np.float32),
                     rng.uniform(0, 255, (n_gauss, 3)).astype(np.float32)),
        sh_degree=3,
    )
    params["scales"] = jnp.full_like(params["scales"], jnp.log(0.015))
    c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = 6.0
    cam = Camera(
        c2w=jnp.asarray(c2w[:3]), fx=jnp.asarray(500.0), fy=jnp.asarray(500.0),
        cx=jnp.asarray(width / 2.0), cy=jnp.asarray(height / 2.0),
        time=jnp.asarray(0.5), width=width, height=height,
    )

    means = params["means"]
    quats = params["quats"] / jnp.linalg.norm(params["quats"], axis=-1, keepdims=True)
    scales = jnp.exp(params["scales"])
    opac = jax.nn.sigmoid(params["opacities"][..., 0])
    proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, width, height)
    colors = jax.random.uniform(jax.random.PRNGKey(1), (n_gauss, 3))
    capacity = 400_000
    target = jax.random.uniform(jax.random.PRNGKey(2), (height, width, 3))

    def proj_fwd(means, quats, scales):
        p = project_gaussians(means, quats, scales, cam.viewmat, cam.K, width, height)
        return p.means2d, p.conics, p.depths

    bench_fn("projection fwd", proj_fwd, [means, quats, scales])
    g_proj = jax.grad(lambda m, q, s: sum(jnp.sum(x) for x in proj_fwd(m, q, s)))
    bench_fn("projection fwd+bwd", lambda m, q, s: g_proj(m, q, s), [means, quats, scales])

    def binning(m2d):
        i = build_intersections_segments(
            m2d, proj.radii, proj.depths, width, height, 16, capacity, 128
        )
        return i.gauss_ids.astype(jnp.float32).sum()

    bench_fn("binning", binning, [proj.means2d])

    # binning sub-phases on matched shapes
    N = n_gauss
    rng2 = np.random.default_rng(1)
    tile_id = jnp.asarray(rng2.integers(0, 1200, capacity).astype(np.int32))
    depth_key = jnp.asarray(rng2.uniform(1, 5, capacity).astype(np.float32))
    gid = jnp.asarray(rng2.integers(0, N, capacity).astype(np.int32))
    first_slot = jnp.asarray(
        np.sort(rng2.choice(capacity, N, replace=False)).astype(np.int32)
    )
    g_iota = jnp.arange(N, dtype=jnp.int32)
    per_g5 = jnp.asarray(rng2.normal(size=(N, 5)).astype(np.float32))

    bench_fn(
        "  bin: 2-key sort (3 operands)",
        lambda d: jax.lax.sort((tile_id, d, gid), num_keys=2)[2].astype(jnp.float32).sum(),
        [depth_key],
    )
    bench_fn(
        "  bin: mark scatter + cummax",
        lambda d: jnp.clip(
            jax.lax.cummax(
                jnp.full((capacity,), -1, jnp.int32).at[first_slot].max(g_iota, mode="drop"),
                axis=0,
            ), 0, N - 1
        ).astype(jnp.float32).sum() + d[0],
        [depth_key],
    )
    bench_fn(
        "  bin: per_g row gather (cap x 5)",
        lambda d: (per_g5[jnp.clip(gid, 0, N - 1)].sum() + d[0]),
        [depth_key],
    )

    def raster_fwd(m2d, con, col, op):
        r, a, _ = rasterize_pixels_pallas(
            m2d, con, col, op, proj.depths, proj.radii, width, height,
            capacity=capacity,
        )
        return jnp.sum(r) + jnp.sum(a)

    bench_fn("raster fwd (binning+gather+kernel)", raster_fwd,
             [proj.means2d, proj.conics, colors, opac])

    # settled by A/B on hw: scan=mxu, chunk=128 (roll@128 25.3 ms,
    # mxu@256 26.0, roll@256 26.3 vs mxu@128 22.5)
    def raster_loss(m2d, con, col, op):
        r, a, _ = rasterize_pixels_pallas(
            m2d, con, col, op, proj.depths, proj.radii, width, height,
            capacity=capacity,
        )
        return jnp.sum((r - target) ** 2) + 0.3 * jnp.sum(a**2)

    g_raster = jax.grad(raster_loss, argnums=(0, 1, 2, 3))
    bench_fn("raster fwd+bwd", lambda *a: g_raster(*a),
             [proj.means2d, proj.conics, colors, opac])

    cfg = SplatConfig()
    field = make_deform_field(cfg)
    dvars = field.init(jax.random.PRNGKey(3), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    t = jnp.full((1, 1), 0.5)

    def deform_loss(x):
        d_xyz, rot, sc = field.apply(dvars, x, t)
        return jnp.sum(d_xyz.w) + jnp.sum(d_xyz.v) + jnp.sum(rot) + jnp.sum(sc)

    bench_fn("deform bf16 fwd+bwd", lambda x: jax.grad(deform_loss)(x), [means])

    def deform_loss_remat(x):
        apply = jax.checkpoint(lambda xx: field.apply(dvars, xx, t))
        d_xyz, rot, sc = apply(x)
        return jnp.sum(d_xyz.w) + jnp.sum(d_xyz.v) + jnp.sum(rot) + jnp.sum(sc)

    bench_fn(
        "deform bf16 remat fwd+bwd",
        lambda x: jax.grad(deform_loss_remat)(x),
        [means],
    )

    img = jax.random.uniform(jax.random.PRNGKey(4), (height, width, 3))

    def ssim_loss(a):
        return 1.0 - ssim(a, target)

    bench_fn("ssim fwd+bwd", lambda a: jax.grad(ssim_loss)(a), [img])


def run_adam_micro():
    """Time the optimizer/statistics tail of the step in isolation: per-group
    Adam on the lane-padded small params, absgrad stats update, metrics."""
    from freegaussian_tpu.engine.optimizers import (
        OptimizersConfig, apply_group_updates, init_opt_states, make_optimizers,
    )
    from freegaussian_tpu.engine.train_step import GAUSSIAN_GROUPS
    from freegaussian_tpu.models.gaussians import init_gaussians
    from freegaussian_tpu.models.fields import DeformField
    from freegaussian_tpu.models.densify import DensifyState, update_stats

    n = 100_000
    rng = np.random.default_rng(0)
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), n,
        seed_points=(rng.normal(size=(n, 3)).astype(np.float32),
                     rng.uniform(0, 255, (n, 3)).astype(np.float32)),
        sh_degree=3,
    )
    field = DeformField(compute_dtype=jnp.bfloat16)
    dvars = field.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    optimizers = make_optimizers(OptimizersConfig(max_steps=30000))
    pbg = {k: params[k] for k in GAUSSIAN_GROUPS}
    pbg["deform"] = dvars
    states = init_opt_states(optimizers, pbg)
    grads = jax.tree.map(lambda a: a * 1e-3, pbg)

    def adam_all(pbg, grads, states):
        ng, ns = apply_group_updates(optimizers, states, pbg, grads)
        return jax.tree.leaves(ng)[0]

    bench_fn("adam all groups", adam_all, [pbg, grads, states])

    gauss_only = {k: pbg[k] for k in GAUSSIAN_GROUPS}
    g2 = {k: grads[k] for k in GAUSSIAN_GROUPS}
    s2 = {k: states[k] for k in GAUSSIAN_GROUPS}

    def adam_gauss(pbg, grads, states):
        ng, ns = apply_group_updates(optimizers, states, pbg, grads)
        return jax.tree.leaves(ng)[0]

    bench_fn("adam gaussian groups", adam_gauss, [gauss_only, g2, s2])

    def adam_gauss_flat(pbg, grads, states):
        # lane-padding probe: run the same updates on 1D-flattened leaves.
        # (N, k) f32 arrays store lane-padded k -> 128 on TPU; if the Adam
        # tail is padding-bound this should be ~k/128 cheaper.
        flat = lambda t: jax.tree.map(
            lambda a: a.reshape(-1) if getattr(a, "ndim", 0) >= 2 else a, t
        )
        ng, ns = apply_group_updates(
            optimizers, flat(states), flat(pbg), flat(grads)
        )
        return jax.tree.leaves(ng)[0]

    bench_fn("adam gaussian groups FLAT", adam_gauss_flat, [gauss_only, g2, s2])

    dstate = DensifyState.create(n)
    absgrad = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (n, 2)))
    radii = jnp.ones((n,), jnp.float32) * 4

    def stats(dstate, absgrad):
        return update_stats(dstate, radii, absgrad, (480, 640)).xys_grad_norm

    bench_fn("absgrad stats update", stats, [dstate, absgrad])


def run_stepprof():
    """Profile the FULL bench train step (scan of 5) with flax vs fused
    deform: locates where the fused path's in-step regression lives."""
    from freegaussian_tpu.data.cameras import Camera
    from freegaussian_tpu.engine.optimizers import (
        OptimizersConfig, init_opt_states, make_optimizers, apply_group_updates,
    )
    from freegaussian_tpu.engine.train_step import GAUSSIAN_GROUPS
    from freegaussian_tpu.models.gaussians import init_gaussians
    from freegaussian_tpu.models.splat_model import (
        SplatConfig, forward, loss_fn, make_deform_apply, make_deform_field,
    )

    n_gauss, width, height = 100_000, 640, 480
    rng = np.random.default_rng(0)
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), n_gauss,
        seed_points=(rng.normal(scale=1.0, size=(n_gauss, 3)).astype(np.float32),
                     rng.uniform(0, 255, (n_gauss, 3)).astype(np.float32)),
        sh_degree=3,
    )
    params["scales"] = jnp.full_like(params["scales"], jnp.log(0.015))
    c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = 6.0
    camera = Camera(
        c2w=jnp.asarray(c2w[:3]), fx=jnp.asarray(500.0), fy=jnp.asarray(500.0),
        cx=jnp.asarray(width / 2.0), cy=jnp.asarray(height / 2.0),
        time=jnp.asarray(0.5), width=width, height=height,
    )
    optimizers = make_optimizers(OptimizersConfig(max_steps=30000))
    target = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))

    variants = getattr(run_stepprof, "variants", None) or [
        ("flax", {}), ("pallas", {"deform_impl": "pallas"})
    ]
    for label, overrides in variants:
        cfg = SplatConfig(
            warm_up=0, background_color="black", isect_capacity_factor=3,
            **overrides,
        )
        field = make_deform_field(cfg)
        deform_apply = make_deform_apply(cfg, field)
        dvars = field.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 3)), jnp.zeros((1, 1))
        )
        pbg = {k: params[k] for k in GAUSSIAN_GROUPS}
        pbg["deform"] = dvars
        opt_states = init_opt_states(optimizers, pbg)

        def train_step(carry, _):
            p, dv, states, t = carry

            def compute_loss(p_, dv_):
                out = forward(
                    cfg, p_, alive, camera.replace(time=t),
                    deform_variables=dv_, deform_apply=deform_apply,
                    sh_degree_now=3, warmed_up=jnp.asarray(True),
                    train=True, bg_rng=None,
                )
                return loss_fn(cfg, out, {"image": target}, p_, alive)["main_loss"]

            loss, (gp, gd) = jax.value_and_grad(compute_loss, argnums=(0, 1))(p, dv)
            pb = {k: p[k] for k in GAUSSIAN_GROUPS}
            pb["deform"] = dv
            gb = {k: gp[k] for k in GAUSSIAN_GROUPS}
            gb["deform"] = gd
            ng, ns = apply_group_updates(optimizers, states, pb, gb)
            return ({k: ng[k] for k in GAUSSIAN_GROUPS}, ng["deform"], ns, t + 1e-5), loss

        @jax.jit
        def run(p, dv, states):
            carry, losses = jax.lax.scan(
                train_step, (p, dv, states, jnp.asarray(0.5)), None, length=5
            )
            return losses

        _profile_op_table(
            f"step_{label}",
            lambda: run(params, dvars, opt_states), [], topk=30,
        )


def run_tri():
    """Three-way forward-image comparison ON THIS BACKEND: pallas compiled,
    pallas interpret, and the jnp oracle — localizes which pair diverges."""
    from freegaussian_tpu.ops.rasterize_pallas import rasterize_pixels_pallas
    from freegaussian_tpu.ops.rasterize_ref import rasterize_pixels_reference

    n, width, height = 1500, 128, 128
    # identical input VALUES across backends: generated once on CPU
    z = np.load("/tmp/tri_inputs.npz")
    means2d = jnp.asarray(z["means2d"])
    conics = jnp.asarray(z["conics"])
    colors = jnp.asarray(z["colors"])
    opacities = jnp.asarray(z["opacities"])
    depths = jnp.asarray(z["depths"])
    radii = jnp.asarray(z["radii"])

    outs = {}
    # NB: everything under jax.jit — unjitted op-by-op dispatch compiles each
    # tiny binning op separately through the axon tunnel (~30 s apiece).
    for name, fn in [
        ("compiled", jax.jit(lambda: rasterize_pixels_pallas(
            means2d, conics, colors, opacities, depths, radii, width, height,
            capacity=16 * n, interpret=False))),
        ("interp", jax.jit(lambda: rasterize_pixels_pallas(
            means2d, conics, colors, opacities, depths, radii, width, height,
            capacity=16 * n, interpret=True))),
        ("oracle", jax.jit(lambda: rasterize_pixels_reference(
            means2d, conics, colors, opacities, depths, radii, width, height))),
    ]:
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r[0])
        outs[name] = np.asarray(r[0])
        log(f"[tri] {name} done ({time.time()-t0:.0f}s)")
    for a_, b_ in [("compiled", "interp"), ("compiled", "oracle"), ("interp", "oracle")]:
        d = np.abs(outs[a_] - outs[b_]).max(-1)
        log(
            f"[tri] {a_} vs {b_}: max|d|={d.max():.3e} "
            f"px>1e-4: {(d > 1e-4).sum()}/{d.size}"
        )
    np.save("/tmp/tri_compiled.npy", outs["compiled"])
    np.save("/tmp/tri_oracle.npy", outs["oracle"])
    # cross-backend: against the CPU-produced references on the same inputs
    import os

    for ref_name in ("tri_cpu_pallas", "tri_cpu_oracle"):
        path = f"/tmp/{ref_name}.npy"
        if os.path.exists(path):
            ref = np.load(path)
            for name in ("compiled", "oracle"):
                d = np.abs(outs[name] - ref).max(-1)
                log(
                    f"[tri] {name}(this) vs {ref_name}: max|d|={d.max():.3e} "
                    f"px>1e-4: {(d > 1e-4).sum()}/{d.size}"
                )
    # error-depth correlation: are bad pixels in heavy-overlap regions?
    d = np.abs(outs["compiled"] - outs["oracle"]).max(-1)
    ys, xs = np.nonzero(d > 5e-4)
    if len(ys):
        log(f"[tri] bad px count={len(ys)} y[{ys.min()},{ys.max()}] x[{xs.min()},{xs.max()}]")


def main():
    parts = sys.argv[1:] or ["parity", "micro", "mlp", "step"]
    # f32 matmul default: XLA dot-ifies reductions like sum(x*y) / sum(x^2)
    # and would run them at MXU bf16 input precision otherwise (this skewed
    # the parity loss prints by 0.7% before being pinned).
    jax.config.update("jax_default_matmul_precision", "float32")
    log(f"devices: {jax.devices()}")
    if "xinterp" in parts:
        run_xinterp()
    if "fused" in parts:
        run_fused()
    if "fusedmicro" in parts:
        run_fusedmicro()
    if "fusedprof" in parts:
        run_fusedprof()
    if "profile" in parts:
        run_profile()
    if "tri" in parts:
        run_tri()
    if "parity" in parts:
        run_parity()
    if "micro" in parts:
        run_micro()
    if "mlp" in parts:
        run_mlp()
    if "step" in parts:
        sys.path.insert(0, ".")
        import bench

        bench.main()
    if "adam" in parts:
        run_adam_micro()
    if "evalperf" in parts:
        run_evalperf()
    if "fusedsweep" in parts:
        run_fusedsweep()
    if "stepprof" in parts:
        run_stepprof()
    if "stepab" in parts:
        # full-step A/B: flax-remat deform vs fused-kernel deform, one process
        sys.path.insert(0, ".")
        import bench

        bench.main({"deform_impl": "flax"}, label="deform_flax")
        bench.main({"deform_impl": "xla"}, label="deform_xla")
        bench.main({"deform_impl": "pallas"}, label="deform_pallas")
    if "r2ab" in parts:
        # round-2 late A/B batch: opacity-tight binning radius (exact) and
        # HIGH-precision scan matmuls; hardware parity at HIGH via xinterp.
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        run_xinterp()  # baseline hardware parity at HIGHEST
        bench.main({"tight_radius": False}, label="tight_off")
        bench.main({}, label="tight_on")
        rp.SCAN_PRECISION = jax.lax.Precision.HIGH
        bench.main({}, label="tight_on_scan_high")
        run_xinterp()  # hardware parity with HIGH scans
        run_adam_micro()
    if "r2ab2" in parts:
        # moment-backward + table-driven bwd early-out batch: hardware parity
        # FIRST (interpret mode cannot catch Mosaic window-flush bugs), then
        # in-process step A/Bs. SCAN_PRECISION mutation mid-process hit a JAX
        # lowering-cache KeyError — scan-precision A/B runs as its own part.
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        run_xinterp()  # new bwd path on hardware
        bench.main({}, label="moments_eo_tight")
        bench.main({"tight_radius": False}, label="moments_eo_notight")
        run_adam_micro()
        # module-flag mutation last: a mid-process retrace after this kind of
        # mutation hit a JAX lowering-cache KeyError once (r2ab scan flip)
        rp.BWD_EARLY_OUT = False
        bench.main({}, label="moments_noeo")
    if "r2ab3" in parts:
        # vpu-moment backward + flat-adam probe + tight-radius localization
        sys.path.insert(0, ".")
        import bench

        run_xinterp()  # vpu-moment parity on hardware
        bench.main({}, label="vpum_eo_tight")
        bench.main({"tight_radius": False}, label="vpum_eo_notight")
        run_adam_micro()
        run_stepprof.variants = [
            ("tight", {}), ("notight", {"tight_radius": False})
        ]
        run_stepprof()
    if "r2ab4" in parts:
        # FWD early-out (SMEM-scalar branch): compile time + parity + step
        # A/B at the trained-like bench point; BWD-EO contribution there too.
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        rp.FWD_EARLY_OUT = True
        run_xinterp()  # logs compile seconds — watch for Mosaic blowup
        bench.main({}, label="fwd_eo_on")
        rp.FWD_EARLY_OUT = False
        bench.main({}, label="fwd_eo_off")
        rp.BWD_EARLY_OUT = False
        bench.main({}, label="all_eo_off")
    if "r2ab7" in parts:
        # ellipse-tile cull (session 3): hardware parity with the cull ON,
        # then in-process step A/B off vs on
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        run_xinterp()  # ELLIPSE_CULL defaults True — parity with cull active
        # NOTE: the bench workload changed 2026-08-18 (trained-like deform
        # head magnitude — the old runs silently clamped a deform-inflated
        # ~1.4M-bbox workload at 300k slots; docs/NOTES_ROUND2.md). Both
        # legs below are HONEST (no overflow): off at the bbox-fitting
        # capacity, on at the kept-fitting self-calibrated one.
        rp.ELLIPSE_CULL = False
        bench.main({"isect_capacity": 768_000}, label="cull_off_honest")
        rp.ELLIPSE_CULL = True
        bench.main({}, label="cull_on_capfit")
        from freegaussian_tpu.ops import tiles as _tiles

        _tiles.PRECULL_T_MAX = 16  # halves the dense precull tests; more
        bench.main({}, label="cull_on_tmax16")  # big-bbox rect fallbacks
        _tiles.PRECULL_T_MAX = 32
    if "r4ab1" in parts:
        # round-4 batch 1: hardware parity with the _gather_rows select
        # removal (garbage-tail invariant — CPU cannot see it), then deform
        # heads-fused + remat-policy A/Bs in one process.
        sys.path.insert(0, ".")
        import bench

        run_xinterp()
        bench.main({}, label="r4_base")
        bench.main({"deform_impl": "headsfused"}, label="r4_headsfused")
        bench.main(
            {"deform_impl": "headsfused", "deform_remat_policy": "dots"},
            label="r4_headsfused_dots",
        )
        bench.main({"deform_remat_policy": "dots"}, label="r4_dots")
    if "r4ab2" in parts:
        # round-4 batch 2: structural knobs at the 15.7M state — remat off,
        # chunk/tile size, capacity headroom, split2 color dots (module-flag
        # mutation LAST: mid-process lowering-cache hazard).
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        bench.main({}, label="r4b_base")
        bench.main({"deform_remat": False}, label="r4b_noremat")
        bench.main({"chunk": 256}, label="r4b_chunk256")
        bench.main({"tile_size": 16}, label="r4b_tile16")
        bench.main({}, headroom=1.3, label="r4b_headroom13")
        rp.COLOR_PRECISION = "split2"
        run_xinterp()
        bench.main({}, label="r4b_split2color")
    if "benchprof" in parts:
        # per-op profile of the DEFAULT bench configuration (the honest
        # trained-like workload bench.py measures) — round-3 planning table
        sys.path.insert(0, ".")
        import shutil

        import bench

        shutil.rmtree("/tmp/jaxprof_bench", ignore_errors=True)
        bench.main(label="benchprof", profile_dir="/tmp/jaxprof_bench")
        _print_trace_table("bench_default", "/tmp/jaxprof_bench", iters=30)
    if "r2ab8" in parts:
        # factorial decomposition of the r2ab7 surprise (cull ON slower than
        # OFF at the honest workload): {precull on/off} x {capacity}.
        # Known from r2ab7: off@768k=11.17M, pre_on@capfit(313k)=8.83M.
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        rp.PRECULL = False
        bench.main({"isect_capacity": 768_000}, label="postcull_768k", calibrate=False)
        rp.PRECULL = True
        bench.main({"isect_capacity": 768_000}, label="precull_768k", calibrate=False)
    if "r2ab6" in parts:
        # split2 v2 (f32-operand bf16-valued split dots) parity + step A/B
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        rp.SCAN_PRECISION = "split2"
        run_xinterp()
        bench.main({}, label="split2_v2")
    if "scanhigh" in parts:
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        rp.SCAN_PRECISION = jax.lax.Precision.HIGH
        run_xinterp()
        bench.main({}, label="scan_high")
    if "r3ab" in parts:
        # round-3 single-chip perf batch at the honest workload:
        # (1) fresh baseline, (2) fwd-only split2 scans (bwd stays HIGHEST —
        # no r2ab6 cancellation), (3) single-key binning sort, (4) both,
        # (5) chunk-size legs. Hardware parity (xinterp) brackets the knobs.
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp
        from freegaussian_tpu.ops import tiles as _tiles

        bench.main({}, label="r3_baseline")
        bench.main({"chunk": 256}, label="r3_chunk256")
        # chunk=64 is not lowerable: the packed block's lane dim must be a
        # multiple of 128
        _tiles.SINGLE_KEY_SORT = True
        bench.main({}, label="r3_singlekey")
        rp.SCAN_PRECISION_FWD = "split2"
        bench.main({}, label="r3_singlekey_fwdsplit2")
        run_xinterp()  # hardware parity with both knobs active
        _tiles.SINGLE_KEY_SORT = False
        bench.main({}, label="r3_fwdsplit2")
    if "r2ab5" in parts:
        # halves fwd-EO revalidation + split2 scan precision A/B
        sys.path.insert(0, ".")
        import bench
        from freegaussian_tpu.ops import rasterize_pallas as rp

        run_xinterp()  # halves EO, HIGHEST scans: parity + compile time
        bench.main({}, label="halves_eo_highest")
        rp.SCAN_PRECISION = "split2"
        run_xinterp()  # split2 parity on hardware
        bench.main({}, label="halves_eo_split2")


if __name__ == "__main__":
    main()
