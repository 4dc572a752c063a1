#!/usr/bin/env python
"""Scaling-efficiency report: distributed whole-map BA on a device mesh.

Times the landmark-chunked VI global BA single-device vs mesh-sharded
(parallel/dist_gba.py) and reports LM iters/s, parallel efficiency, and the
analytic communication volume per LM iteration (bytes moved by the psum of
the Schur-reduced camera system + the all_gather of the landmark update)
against the per-iteration FLOPs — the comm-vs-compute ratio that decides how
the design rides ICI at real pod scale (BASELINE.md north-star reporting).

Runs on an N-device virtual CPU mesh by default (no multi-chip hardware in
this environment; the numbers are CPU-mesh-indicative — the comm-volume
accounting is hardware-independent). Prints one JSON line.
"""
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mc_slam_tpu.bench_problems import vi_window_problem  # noqa: E402
from mc_slam_tpu.parallel import dist_ba, dist_gba  # noqa: E402
from mc_slam_tpu.solver import ba_chunked  # noqa: E402
from mc_slam_tpu.solver.ba_vi import DC  # noqa: E402


def timeit(f, n=3, warm=1):
    for _ in range(warm):
        jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    n_dev = len(jax.devices())
    iters = 8
    # a whole-map-scale problem: 32 KFs, 8192 landmarks, ~16k observations
    p = vi_window_problem(n_kf=32, n_pts=8192, obs_per_kf=512)
    obs, edges = p["obs"], p["edges"]
    Np = p["pts"].shape[0]
    n_chunks = 64
    cobs, C = ba_chunked.chunk_observations(
        np.asarray(obs.cam), np.asarray(obs.pt), np.asarray(obs.uv),
        np.asarray(obs.inv_sigma2), np.asarray(obs.valid), Np, n_chunks)

    def single():
        ns, pts, cost = ba_chunked.vi_gba_chunked(
            p["ns"], p["pts"], cobs, edges, p["cam"], p["ext"], p["gw"],
            p["free"], p["pt_mask"], iters=iters)
        return cost

    t1 = timeit(single)

    mesh = dist_ba.make_mesh(n_dev)
    cobs_s = dist_gba.shard_chunked_obs(mesh, cobs)

    def sharded():
        ns, pts, cost = dist_gba.vi_gba_chunked_sharded(
            mesh, p["ns"], p["pts"], cobs_s, edges, p["cam"], p["ext"],
            p["gw"], p["free"], p["pt_mask"], iters=iters)
        return cost

    tn = timeit(sharded)

    Nc = p["ns"].P.shape[0]
    d = Nc * DC
    # per-iteration collective volume (dist_gba.py header): one psum of the
    # dense reduced system (S + g + diag + cost) + one all_gather of the
    # (Np,3) landmark update, replicated to n_dev receivers
    psum_bytes = (d * d + d + d + 1) * 4
    ag_bytes = Np * 3 * 4
    # per-iteration FLOPs: XLA's estimate for the single-device executable
    try:
        ca = (jax.jit(single).lower().compile().cost_analysis())
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / iters
    except Exception:
        flops = 0.0
    out = {
        "n_devices": n_dev,
        "platform": jax.devices()[0].platform,
        "ba_iters_s_1dev": round(iters / t1, 2),
        "ba_iters_s_mesh": round(iters / tn, 2),
        "speedup": round(t1 / tn, 3),
        "efficiency": round(t1 / tn / n_dev, 3),
        "note": "virtual CPU mesh: devices share host cores; "
                "indicative of comm structure, not ICI throughput",
        "comm_per_iter_bytes": {"psum_reduced_system": psum_bytes,
                                "all_gather_landmarks": ag_bytes},
        "flops_per_iter": flops,
        "flops_per_comm_byte": round(flops / max(psum_bytes + ag_bytes, 1), 1),
        "problem": {"n_kf": Nc, "n_pts": Np, "n_obs": int(obs.cam.shape[0]),
                    "chunks": n_chunks, "iters": iters},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
