"""Benchmark on the real TPU chip. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: fused frame-tracking throughput (ORB extraction at EuRoC geometry
752x480 / 1024 features / 8 levels + projection matching against a 16k-point
map + pose-only LM) — the reference's per-frame hot path, which it runs in
real time at 20 fps on a desktop i7 (BASELINE.md: camera rate the system is
paced to). vs_baseline = our frames/s / 20.

Sub-metrics (printed as comments on stderr): extraction-only fps, local-window
VI BA solves/s, Hamming match rate.
"""
import json
import sys
import time

import numpy as np


def timeit(f, n=20, warmup=2):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from mc_slam_tpu.bench_problems import vi_window_problem
    from mc_slam_tpu.camera import euroc_camera
    from mc_slam_tpu.frontend import extractor, matching
    from mc_slam_tpu.pipeline import tracking
    from mc_slam_tpu.slam_map.mapstate import empty_map
    from mc_slam_tpu.solver import ba_vi, factors

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    cam = euroc_camera()
    ext = factors.identity_extrinsics()

    # --- workload 1: full frame tracking (extract + match-vs-map + pose LM) ---
    H, W = 480, 752
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    NF, NL = 1024, 8
    m = empty_map(max_kf=4, max_mp=16384, n_feat=NF)
    # populate a synthetic active map
    P_mp = 16384
    pts = np.stack([rng.uniform(-6, 6, P_mp), rng.uniform(-4, 4, P_mp),
                    rng.uniform(3, 12, P_mp)], 1).astype(np.float32)
    words = rng.integers(0, 2**32, size=(P_mp, 8), dtype=np.uint32)
    from mc_slam_tpu.frontend.orb import unpack_pm1
    pm1 = unpack_pm1(jnp.asarray(words))
    m = m._replace(mp_pos=jnp.asarray(pts), mp_pm1=pm1,
                   mp_active=jnp.ones(P_mp, bool),
                   mp_min_dist=jnp.full(P_mp, 0.5),
                   mp_max_dist=jnp.full(P_mp, 30.0))
    P0, R0 = jnp.zeros(3), jnp.eye(3)

    @jax.jit
    def frame_step(img, m, P0, R0):
        # NOTE: the map MUST be an argument — closed-over device arrays become
        # XLA constants and large constants are rematerialized per call (~8x
        # slowdown measured on v5e)
        f = extractor.extract(img, n_features=NF, n_levels=NL)
        res = tracking.track_frame_visual(m, f, f.xy, cam, ext, P0, R0, iters=10)
        return res.P, res.n_inliers

    dt_frame = timeit(lambda: frame_step(img, m, P0, R0), n=20)
    fps = 1.0 / dt_frame
    print(f"# frame_tracking: {dt_frame*1e3:.2f} ms -> {fps:.1f} fps", file=sys.stderr)

    # --- workload 2: extraction only ---
    ex = jax.jit(lambda im: extractor.extract(im, n_features=NF, n_levels=NL).xy)
    dt_ex = timeit(lambda: ex(img), n=20)
    print(f"# extraction: {dt_ex*1e3:.2f} ms", file=sys.stderr)

    # --- workload 3: local-window VI BA (20 KFs, 2k points, 10k obs) ---
    p = vi_window_problem(n_kf=20, n_pts=2048, obs_per_kf=512)

    def ba_step():
        ns2, pts2, chi2, cost = ba_vi.vi_ba(
            p["ns"], p["pts"], p["obs"], p["edges"], p["cam"], p["ext"],
            p["gw"], p["free"], p["pt_mask"], iters=10)
        return cost

    dt_ba = timeit(ba_step, n=5)
    print(f"# local VI BA (10 LM iters): {dt_ba*1e3:.2f} ms "
          f"-> {10/dt_ba:.1f} LM iters/s", file=sys.stderr)

    # --- workload 3a: IDP window BA (the pipeline's production VI back end,
    # LocalBAPRVIDP parity; DP=1 shrinks the landmark system 3x vs XYZ) ---
    from mc_slam_tpu.bench_problems import vi_window_idp_problem
    from mc_slam_tpu.solver import ba_vi_idp
    pi = vi_window_idp_problem(n_kf=20, n_pts=2048, obs_per_kf=512)

    def idp_step():
        ns2, rho, chi2, cost = ba_vi_idp.vi_ba_idp(
            pi["ns"], pi["rho"], pi["idp_obs"], pi["edges"], pi["cam"],
            pi["ext"], pi["gw"], pi["free"], pi["rho_mask"], iters=10)
        return cost

    dt_idp = timeit(idp_step, n=5)
    print(f"# IDP window BA (10 LM iters): {dt_idp*1e3:.2f} ms", file=sys.stderr)

    # --- workload 3b: batched multi-sequence tracking (8 sequences, 1 chip) ---
    from mc_slam_tpu.parallel import multiseq
    B = 8
    ms = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), m)
    imgs_b = jnp.broadcast_to(img[None], (B, H, W))
    P0b = jnp.zeros((B, 3))
    R0b = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    mstep = multiseq.make_batched_step(cam, ext, n_features=NF, n_levels=NL)
    dt_ms = timeit(lambda: mstep(ms, imgs_b, P0b, R0b)[0], n=10)
    fps_agg = B / dt_ms
    print(f"# batched 8-seq tracking: {dt_ms*1e3:.2f} ms -> {fps_agg:.0f} frames/s aggregate",
          file=sys.stderr)

    # --- workload 4: Hamming matching 1024x16384 ---
    a = pm1[:1024]
    hm = jax.jit(lambda x, y: matching.hamming_matrix(x, y).sum())
    dt_hm = timeit(lambda: hm(a, pm1), n=20)
    rate = 1024 * P_mp / dt_hm / 1e9
    print(f"# hamming 1024x16384: {dt_hm*1e3:.3f} ms -> {rate:.1f} Gpairs/s",
          file=sys.stderr)

    sub = {
        "extraction_ms": round(dt_ex * 1e3, 3),
        "vi_ba_20kf_ms": round(dt_ba * 1e3, 2),
        "vi_ba_idp_20kf_ms": round(dt_idp * 1e3, 2),
        "hamming_gpairs_s": round(rate, 2),
        "batched8_fps_aggregate": round(fps_agg, 1),
    }
    # end-to-end accuracy on the full-scale synthetic EuRoC clone: produced by
    # examples/eval_clone.py over examples/make_euroc_clone.py output (the
    # euroc profile: 752x480, 1024 feat, 8 levels, 512 KF / 16k MP, VI) and
    # recorded in artifacts/ — reproducible offline; too long for the bench's
    # time budget
    import os
    art = os.path.join(os.path.dirname(__file__), "artifacts")
    for name, tag in (("ate_clone_euroc.json", "euroc"),
                      ("ate_clone_mid.json", "mid"),
                      ("ate_clone.json", "")):
        ate_path = os.path.join(art, name)
        if os.path.exists(ate_path):
            with open(ate_path) as f:
                ate = json.load(f)
            sub["ate_clone_rmse_m"] = ate.get("ate_rmse")
            sub["ate_clone_rmse_post_init_m"] = ate.get("ate_rmse_post_init")
            sub["ate_clone_frames"] = ate.get("frames")
            sub["ate_clone_profile"] = ate.get("profile", tag)
            sub["ate_clone_loops"] = ate.get("loops_closed")
            print(f"# clone ATE (precomputed, see artifacts/): {ate}",
                  file=sys.stderr)
            break
    print(json.dumps({
        "metric": "frame_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s per chip (752x480, 1024 feat, 16k-pt map)",
        "vs_baseline": round(fps / 20.0, 3),
        "sub": sub,
    }))


if __name__ == "__main__":
    main()
