"""Tracing / metrics / VI-init observability.

The reference has no tracing framework (SURVEY.md section 5): per-frame times
are printed at exit and TryInitVIO streams scale/bias/gravity/condition-number
text files (src/LocalMapping.cpp:208-237,495-524) that pyplotscripts/plotinit.py
plots. Here:

  * StageTimer — a lightweight named-stage wall-clock registry with summaries
    (median/mean/max), usable as a context manager around pipeline stages;
  * VIInitLog — the reference's diagnostic file set (scale.txt, biasg.txt,
    biasa.txt, gw.txt, condnum.txt, computetime.txt, Rwi.txt) written from
    VIInitResult records, format-compatible with plotinit.py;
  * jax_profile — context manager wrapping jax.profiler.trace for device-level
    kernel breakdowns.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self):
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {"n": len(a), "median_ms": float(np.median(a) * 1e3),
                         "mean_ms": float(a.mean() * 1e3),
                         "max_ms": float(a.max() * 1e3),
                         "total_s": float(a.sum())}
        return out

    def report(self):
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name:<28} n={s['n']:<5} median={s['median_ms']:8.2f}ms "
                         f"mean={s['mean_ms']:8.2f}ms max={s['max_ms']:8.2f}ms")
        return "\n".join(lines)


class VIInitLog:
    """Streams VI-init attempts to the reference's diagnostic file set."""

    def __init__(self, out_dir):
        os.makedirs(out_dir, exist_ok=True)
        self.dir = out_dir
        self._files = {}

    def _f(self, name):
        if name not in self._files:
            self._files[name] = open(os.path.join(self.dir, name), "a")
        return self._files[name]

    def log_attempt(self, t, result, compute_time_ms):
        """result: pipeline.viinit.VIInitResult."""
        gw = np.asarray(result.gw)
        self._f("scale.txt").write(f"{t} {float(result.scale)} {float(result.scale_star)} \n")
        self._f("biasg.txt").write(f"{t} " + " ".join(str(x) for x in np.asarray(result.bg)) + " \n")
        self._f("biasa.txt").write(f"{t} " + " ".join(str(x) for x in np.asarray(result.ba)) + " \n")
        self._f("gw.txt").write(f"{t} {gw[0]} {gw[1]} {gw[2]} {gw[0]} {gw[1]} {gw[2]} \n")
        self._f("condnum.txt").write(f"{t} " + " ".join(str(x) for x in np.asarray(result.cond)) + " \n")
        self._f("computetime.txt").write(f"{t} {compute_time_ms} \n")
        with open(os.path.join(self.dir, "Rwi.txt"), "w") as f:
            R = np.asarray(result.Rwi)
            f.write(" ".join(str(x) for x in R.reshape(-1)) + "\n")
        for fh in self._files.values():
            fh.flush()

    def close(self):
        for fh in self._files.values():
            fh.close()
        self._files = {}


@contextlib.contextmanager
def jax_profile(out_dir):
    import jax
    with jax.profiler.trace(out_dir):
        yield
