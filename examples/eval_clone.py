#!/usr/bin/env python
"""Full-length end-to-end evaluation on the synthetic EuRoC clone.

Generates (if missing) a full-scale clone dataset, runs the complete VI
pipeline through the run_euroc driver path at the euroc profile, scores ATE
against ground truth (evaluate_ate.py parity), and records the result in
artifacts/ate_clone.json for bench.py to report.

  python examples/eval_clone.py [--dataset /tmp/euroc_clone] [--profile euroc]
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TBC = np.array([
    [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
    [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
    [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
    [0.0, 0.0, 0.0, 1.0]], np.float32)


# per-profile dataset generation (make_euroc_clone.py args): the robustness
# envelope mirrors config/euroc.yaml:18-20's sequence-quality spread —
#   euroc/mid/small: the baseline MH-easy-like circuit;
#   loops: 3 laps of the circuit with 8x IMU noise + reduced feature budget
#          (degraded odometry -> real accumulated drift; each revisit is a
#          closure opportunity — MH_03-medium analog);
#   hard:  2 laps at 2x speed, 1.6x yaw sweep, 25 ms blur, 0.55x contrast
#          (fast-rotation/low-texture stress — V1_03-difficult analog; the
#          gate is survival/relocalization, not accuracy).
PROFILE_GEN = {
    "loops": ["--laps", "2", "--imu-noise-scale", "6",
              "--weak-walls", "1", "3", "--weak-contrast", "0.45"],
    "hard": ["--laps", "2", "--yaw-scale", "1.6", "--blur-ms", "25",
             "--tex-contrast", "0.55"],
}
PROFILE_DATASET = {
    "loops": "/tmp/euroc_clone_loops",
    "hard": "/tmp/euroc_clone_hard",
}
# loops: 2 laps at the BASELINE circuit speed (240 s total — the 2x-speed
# 120 s variant loses tracking on the fast ceiling sweep regardless of
# texture, exactly like the reference's V2_03 'lost'); hard keeps the fast
# variant as the stress row.
PROFILE_DURATION = {"loops": 240.0, "hard": 60.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="")
    ap.add_argument("--duration", type=float, default=120.0)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--profile",
                    choices=["euroc", "mid", "small", "loops", "hard"],
                    default="euroc")
    ap.add_argument("--platform", default="",
                    help="jax platform override; empty = device default (TPU when present). Pass cpu for offline runs.")
    ap.add_argument("--final-gba", action="store_true",
                    help="run one whole-map BA before scoring")
    ap.add_argument("--out", default="")
    ap.add_argument("--gate", action="store_true",
                    help="exit nonzero when accuracy/throughput regress past "
                         "the adopted thresholds (reference acceptance: "
                         "run.sh + evaluate_ate.py per-sequence bounds)")
    ap.add_argument("--gate-ate", type=float, default=0.15,
                    help="max post-init ATE RMSE [m]")
    ap.add_argument("--gate-scale", type=float, default=0.02,
                    help="max |1 - Sim3 scale|")
    ap.add_argument("--gate-fps", type=float, default=20.0,
                    help="min amortized e2e fps (ignored on cpu platform)")
    ap.add_argument("--gate-lost", type=int, default=60,
                    help="max lost frames")
    ap.add_argument("--no-loops", action="store_true",
                    help="disable loop closing (drift diagnosis)")
    ap.add_argument("--save-ckpt", default="/tmp/mc_slam_clone_ckpt.npz",
                    help="system checkpoint for at-scale offline benches "
                         "(bench_scaling loads the REAL map); empty disables")
    # On-chip loop-closure demonstration: the room world re-anchors tracking
    # against the whole map, so natural drift stays at the few-mm level and
    # revisits re-attach within the match window — closure is never NEEDED
    # (measured: loops profile 0 lost / 13 mm over 2 laps). This flag
    # injects the e2e loop test's mechanism at full scale: a small per-frame
    # SE3 warp (gravity-preserving yaw + translation; scale fixed — VI) of
    # everything created after a cutoff, during [t0, t1] of lap 1. The
    # artifact records drift_injected=true; pair with --no-loops for the
    # healing comparison.
    ap.add_argument("--inject-drift", action="store_true")
    ap.add_argument("--drift-window", type=float, nargs=2, default=[20.0, 50.0])
    ap.add_argument("--drift-step", type=float, nargs=4,
                    default=[3e-4, -2e-4, 2e-4, 1.5e-4],
                    help="per-frame [dx dy dz yaw]")
    args = ap.parse_args()
    if not args.dataset:
        args.dataset = PROFILE_DATASET.get(args.profile, "/tmp/euroc_clone")
    if args.duration == 120.0 and args.profile in PROFILE_DURATION:
        args.duration = PROFILE_DURATION[args.profile]

    mav0 = os.path.join(args.dataset, "mav0")
    if not os.path.exists(os.path.join(mav0, "cam0", "data.csv")):
        print(f"generating clone dataset at {args.dataset}...", file=sys.stderr)
        subprocess.check_call([sys.executable,
                               os.path.join(os.path.dirname(__file__),
                                            "make_euroc_clone.py"),
                               "--out", args.dataset,
                               "--duration", str(args.duration)]
                              + PROFILE_GEN.get(args.profile, []))

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if jax.default_backend() != "cpu":
        # persistent compile cache: verified working on the TPU backend
        # (XLA:CPU executable (de)serialization is known-bad on this host —
        # see tests/conftest.py — so gate on the accelerator)
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("MC_SLAM_JAXCACHE",
                                         "/tmp/mc_slam_jaxcache"))
        # persist EVERY executable: a full pipeline run makes ~470 compiles of
        # which ~460 are sub-second eager/glue ops totalling ~190 s through a
        # remote-attached chip - the default 1 s floor re-paid them every run
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mc_slam_tpu.camera import euroc_camera
    from mc_slam_tpu.eval.ate import ate_rmse
    from mc_slam_tpu.io import native_loader
    from mc_slam_tpu.pipeline.system import SlamConfig, SlamSystem

    cam = euroc_camera()
    if args.profile in ("euroc", "hard"):
        cfg = SlamConfig(max_kf=512, max_mp=16384, n_feat=1024, n_levels=8,
                         local_window=20, use_imu=True, vi_init_time=15.0,
                         g_mag=9.810)
    elif args.profile == "loops":
        # degraded odometry on purpose: a third of the feature budget (full
        # 8-level pyramid kept — the coarse levels are what track through
        # the doubled motion blur), so visual constraints are weaker and
        # the 6x IMU noise accumulates into closable drift across the laps
        cfg = SlamConfig(max_kf=512, max_mp=16384, n_feat=384, n_levels=8,
                         local_window=20, use_imu=True, vi_init_time=15.0,
                         g_mag=9.810)
    elif args.profile == "mid":
        cfg = SlamConfig(max_kf=256, max_mp=8192, n_feat=768, n_levels=4,
                         local_window=12, use_imu=True, vi_init_time=15.0,
                         g_mag=9.810)
    else:
        cfg = SlamConfig(max_kf=64, max_mp=4096, n_feat=512, n_levels=3,
                         local_window=8, use_imu=True, vi_init_time=15.0,
                         g_mag=9.810)
    slam = SlamSystem(cam, cfg, Tbc=TBC)
    if args.no_loops:
        slam.enable_loop_closing = False

    gt = np.loadtxt(os.path.join(mav0, "state_groundtruth_estimate0", "data.csv"),
                    delimiter=",", comments="#")
    t_gt = gt[:, 0] / 1e9
    P_gt = gt[:, 1:4]

    times = []
    n = 0

    # device-side drift injection (see --inject-drift): ONE dispatch per
    # injected frame, no host pulls
    import jax as _jax
    import jax.numpy as _jnp

    @_jax.jit
    def _inject(m, ns_last, Rg, tg, cutoff):
        kf_sel = m.kf_active & (m.kf_id > cutoff)
        ns = m.kf_ns
        P2 = _jnp.where(kf_sel[:, None], ns.P @ Rg.T + tg, ns.P)
        R2 = _jnp.where(kf_sel[:, None, None],
                        _jnp.einsum("ij,kjl->kil", Rg, ns.R), ns.R)
        V2 = _jnp.where(kf_sel[:, None], ns.V @ Rg.T, ns.V)
        mp_sel = m.mp_active & (m.mp_first_kf > cutoff)
        X2 = _jnp.where(mp_sel[:, None], m.mp_pos @ Rg.T + tg, m.mp_pos)
        N2 = _jnp.where(mp_sel[:, None], m.mp_normal @ Rg.T, m.mp_normal)
        m2 = m._replace(kf_ns=ns._replace(P=P2, R=R2, V=V2),
                        mp_pos=X2, mp_normal=N2)
        ns2 = ns_last._replace(P=Rg @ ns_last.P + tg, R=Rg @ ns_last.R,
                               V=Rg @ ns_last.V)
        return m2, ns2

    drift_state = {"cutoff": None, "t_start": None}
    if args.inject_drift:
        from mc_slam_tpu import lie as _lie
        _dstep = np.asarray(args.drift_step, np.float32)
        _Rg = _jnp.asarray(np.asarray(
            _lie.so3_exp(_jnp.asarray([0.0, 0.0, _dstep[3]]))), _jnp.float32)
        _tg = _jnp.asarray(_dstep[:3])

    def maybe_inject(t_frame):
        if not args.inject_drift or not slam.vi_inited or slam.state != 2:
            return
        if drift_state["t_start"] is None:
            drift_state["t_start"] = t_frame
        rel = t_frame - drift_state["t_start"]
        if not (args.drift_window[0] <= rel <= args.drift_window[1]):
            return
        if drift_state["cutoff"] is None:
            drift_state["cutoff"] = slam.frame_id - 1
        cut = jnp.asarray(drift_state["cutoff"], jnp.int32)
        slam.m, slam.last_ns = _inject(slam.m, slam.last_ns, _Rg, _tg, cut)
        slam.last_pose = (slam.last_ns.P, slam.last_ns.R)
        if slam.prior is not None:
            ns0 = slam.prior.ns0
            slam.prior = slam.prior._replace(ns0=ns0._replace(
                P=_Rg @ ns0.P + _tg, R=_Rg @ ns0.R, V=_Rg @ ns0.V))

    def run_frame(item):
        nonlocal n
        t_frame, buf, imu_rows = item
        t0 = time.perf_counter()
        slam.track(buf, t_frame, imu=imu_rows)
        maybe_inject(t_frame)
        times.append(time.perf_counter() - t0)
        n += 1
        if n % 200 == 0:
            stages = " ".join(
                f"{k}={v['median_ms']:.0f}/{v['n']}"
                for k, v in slam.timers.summary().items())
            print(f"frame {n}: state={slam.state} kf={len(slam.kf_slots)} "
                  f"mp={int(slam.m.mp_active.sum())} vi={slam.vi_inited} "
                  f"loops={slam.n_loops_closed} "
                  f"median={np.median(times)*1e3:.0f}ms [{stages}]",
                  file=sys.stderr)

    # one-frame lookahead: the NEXT frame's (uint8) host->device upload is
    # issued before tracking the current frame so the transfer overlaps compute
    pending = None
    for t_frame, img, imu_rows in native_loader.NativeEurocLoader(mav0):
        buf = slam.upload(img)
        if pending is not None:
            run_frame(pending)
            if args.max_frames and n >= args.max_frames:
                pending = None
                break
        pending = (t_frame, buf, imu_rows)
    if pending is not None:
        run_frame(pending)

    if args.final_gba:
        t0 = time.perf_counter()
        slam.global_refine()
        print(f"final GBA: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    if args.save_ckpt:
        from mc_slam_tpu.io import checkpoint as _ckpt
        try:
            _ckpt.save_system(args.save_ckpt, slam)
            print(f"checkpoint -> {args.save_ckpt}", file=sys.stderr)
        except Exception as e:
            print(f"checkpoint save failed: {e}", file=sys.stderr)
    traj = slam.get_trajectory()
    t_est = np.asarray([x[0] for x in traj])
    P_est = np.asarray([x[1] for x in traj])
    # score both with Sim3 alignment (the reference's mono scoring always
    # aligns scale) and on the post-VI-init stretch only
    stats_s = ate_rmse(t_est, P_est, t_gt, P_gt, with_scale=True)
    t_init = t_est[0] + 20.0
    post = t_est > t_init
    stats_post = (ate_rmse(t_est[post], P_est[post], t_gt, P_gt,
                           with_scale=True) if post.sum() > 10 else {})
    art_dir = os.path.join(os.path.dirname(__file__), "..", "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    # ---- per-segment drift diagnostics (identify the dominant error source
    # instead of guessing): aligned error vs time + drift per metre travelled
    # over 5 s windows, reported separately pre/post VI init ----
    drift = {}
    try:
        from mc_slam_tpu.eval.ate import associate, horn_align
        pairs = associate(t_est, t_gt, 0.02)
        ie = np.asarray([p[0] for p in pairs])
        ig = np.asarray([p[1] for p in pairs])
        Pe, Pg, te = P_est[ie], P_gt[ig], t_est[ie]
        s_al, R_al, t_al = horn_align(Pe, Pg, True)
        Pa = (s_al * (R_al @ Pe.T)).T + t_al
        err_t = np.linalg.norm(Pa - Pg, axis=1)
        seg_len = 5.0
        rows = []
        t0_, tend = te[0], te[-1]
        k0 = 0
        while t0_ < tend:
            selw = (te >= t0_) & (te < t0_ + seg_len)
            if selw.sum() > 5:
                dist = np.linalg.norm(np.diff(Pg[selw], axis=0),
                                      axis=1).sum()
                de = err_t[selw][-1] - err_t[selw][0]
                rows.append({"t0": round(float(t0_ - te[0]), 1),
                             "dist_m": round(float(dist), 2),
                             "err_mean_m": round(float(err_t[selw].mean()), 4),
                             "derr_per_m": round(float(de / max(dist, 1e-6)), 4)})
            t0_ += seg_len
            k0 += 1
        drift = {"segments": rows,
                 "err_t_final_m": round(float(err_t[-1]), 4),
                 "worst_segment": max(rows, key=lambda r: r["err_mean_m"])
                 if rows else {}}
        np.savez(os.path.join(art_dir, f"drift_clone_{args.profile}.npz"),
                 te=te, err_t=err_t)
    except Exception as e:
        print(f"drift diagnostics failed: {e}", file=sys.stderr)
    # anchor diagnostics: which keyframe each frame composed through, and
    # whether it fell back to its stale track-time pose (culled/recycled ref)
    kf_id_h = np.asarray(slam.m.kf_id)
    kf_act_h = np.asarray(slam.m.kf_active)
    anchor_kid = np.asarray([
        (kd if (k >= 0 and kf_act_h[k] and kf_id_h[k] == kd) else -1)
        for (_, k, kd) in slam.traj.meta], np.int64)
    np.savez(os.path.join(art_dir, f"traj_clone_{args.profile}.npz"),
             t_est=t_est, P_est=P_est, t_gt=t_gt, P_gt=P_gt,
             anchor_kid=anchor_kid)
    try:
        from mc_slam_tpu.viz import save_map_snapshot
        save_map_snapshot(
            slam.m, traj,
            os.path.join(art_dir, f"map_clone_{args.profile}.png"),
            title=f"clone/{args.profile}: {n} frames, "
                  f"{len(slam.kf_slots)} KFs, {slam.n_loops_closed} loops")
    except Exception as e:  # rendering must never fail the eval
        print(f"map snapshot failed: {e}", file=sys.stderr)
    # full wall-clock attribution (the reference prints median AND mean,
    # mono_EuRoC_vins.cc:188-232): per-stage totals must account for the run,
    # with the remainder reported as unattributed (compiles, host glue)
    stages = slam.timers.summary()
    wall = float(sum(times))
    attributed = sum(v["total_s"] for v in stages.values())
    # recompile telemetry: steady state must not recompile per frame
    ncomp = {}
    try:
        from mc_slam_tpu.pipeline import tracking as _tr
        ncomp = {
            "frame_vi": int(_tr.frame_pipeline_vi._cache_size()),
            "frame_visual": int(_tr.frame_pipeline_visual._cache_size()),
        }
    except Exception:
        pass
    import subprocess as _sp
    try:
        commit = _sp.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.abspath(__file__))
                         ).stdout.strip()
    except Exception:
        commit = ""
    # dataset provenance: which instance this run actually consumed (r4
    # verdict: the 13.05-vs-15.7 fps gap had no record of the dataset used).
    # Hash = image csv + imu csv + first/last image bytes (fast, captures
    # regeneration with different seeds/params).
    import hashlib
    h = hashlib.sha256()
    try:
        for rel in ("cam0/data.csv", "imu0/data.csv"):
            with open(os.path.join(mav0, rel), "rb") as f:
                h.update(f.read())
        img_dir = os.path.join(mav0, "cam0", "data")
        imgs = sorted(os.listdir(img_dir))
        for nm in (imgs[0], imgs[-1]):
            with open(os.path.join(img_dir, nm), "rb") as f:
                h.update(f.read())
        dataset_hash = h.hexdigest()[:16]
    except Exception:
        dataset_hash = ""
    # longest lost->relocalized span (the hard-profile robustness metric:
    # "not lost, or relocalizes within N frames")
    lost_ev = [f for f, k, _ in slam.events if k == "lost"]
    reloc_ev = [f for f, k, _ in slam.events if k == "reloc"]
    streaks = [min([r for r in reloc_ev if r >= f], default=n) - f
               for f in lost_ev]
    result = {
        "frames": n,
        "n_lost": int(slam.n_lost_frames),
        "n_relocs": len(reloc_ev),
        "max_lost_streak": int(max(streaks, default=0)),
        "tracking_finished_ok": bool(slam.state == 2),
        "keyframes": len(slam.kf_slots),
        "map_points": int(slam.m.mp_active.sum()),
        "vi_inited": bool(slam.vi_inited),
        "loops_closed": int(slam.n_loops_closed),
        "median_track_ms": float(np.median(times) * 1e3),
        "mean_track_ms": float(np.mean(times) * 1e3),
        # amortized end-to-end throughput: total frames / total processing
        # wall clock INCLUDING keyframe-rate events (local mapping, loop
        # closing, GBA) and first-compile warmup — the honest pipeline rate
        "e2e_fps_amortized": float(n / max(wall, 1e-9)),
        # steady-state fps excluding the first 100 frames (compile warmup)
        "e2e_fps_warm": float((n - 100) / max(sum(times[100:]), 1e-9))
        if n > 200 else -1.0,
        "wall_s": wall,
        "wall_attributed_s": round(attributed, 1),
        "wall_unattributed_s": round(wall - attributed, 1),
        "abs_scale_err": abs(1.0 - float(stats_s["scale"])),
        "ate_rmse": float(stats_s["rmse"]),
        "ate_scale": float(stats_s["scale"]),
        "ate_rmse_post_init": float(stats_post.get("rmse", -1.0)),
        "ate_scale_post_init": float(stats_post.get("scale", -1.0)),
        "profile": args.profile,
        "duration_s": args.duration,
        "commit": commit,
        "dataset": os.path.abspath(args.dataset),
        "dataset_hash": dataset_hash,
        "drift_injected": bool(args.inject_drift),
        "drift_params": ({"window_s": args.drift_window,
                          "step": args.drift_step,
                          "cutoff_fid": drift_state["cutoff"]}
                         if args.inject_drift else None),
        "loop_closing_enabled": not args.no_loops,
        "n_compiles": ncomp,
        "stage_ms": {k: round(v["median_ms"], 2) for k, v in stages.items()},
        "drift": drift,
        "events": [[int(f), k, d] for f, k, d in slam.events][-400:],
        "stage_detail": {k: {"n": v["n"],
                             "median_ms": round(v["median_ms"], 2),
                             "mean_ms": round(v["mean_ms"], 2),
                             "max_ms": round(v["max_ms"], 1),
                             "total_s": round(v["total_s"], 1)}
                         for k, v in stages.items()},
    }
    print(json.dumps(result))
    out = args.out or os.path.join(os.path.dirname(__file__), "..",
                                   "artifacts", "ate_clone.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)
    if args.gate:
        import jax as _jax
        on_accel = _jax.devices()[0].platform != "cpu"
        fails = []
        if args.profile == "hard":
            # survival gate (V1_03 analog, config/euroc.yaml:18-20): never
            # permanently lost — every loss must relocalize within 5 s
            if result["max_lost_streak"] > 100:
                fails.append(f"max_lost_streak {result['max_lost_streak']}"
                             f" > 100 frames")
            if not result["tracking_finished_ok"]:
                fails.append("tracking did not finish in OK state")
        else:
            if result["ate_rmse_post_init"] > args.gate_ate:
                fails.append(
                    f"ate_rmse_post_init {result['ate_rmse_post_init']:.3f}"
                    f" > {args.gate_ate}")
            if result["abs_scale_err"] > args.gate_scale:
                fails.append(f"abs_scale_err {result['abs_scale_err']:.4f}"
                             f" > {args.gate_scale}")
            if result["n_lost"] > args.gate_lost:
                fails.append(f"n_lost {result['n_lost']} > {args.gate_lost}")
        if args.profile == "loops" and not args.no_loops \
                and result["loops_closed"] < 1:
            fails.append("loops_closed 0 on the multi-lap drift profile")
        if on_accel and result["e2e_fps_amortized"] < args.gate_fps:
            fails.append(f"e2e_fps {result['e2e_fps_amortized']:.1f}"
                         f" < {args.gate_fps}")
        if fails:
            print("GATE FAILED: " + "; ".join(fails), file=sys.stderr)
            sys.exit(1)
        print("GATE PASSED", file=sys.stderr)


if __name__ == "__main__":
    main()
