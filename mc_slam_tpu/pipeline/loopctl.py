"""Loop-closure orchestration (SlamSystem mixin): detection gating, the
deferred Sim3/verify stages, and closure application (LoopClosing.cpp
roles). Split from system.py (r4 verdict item 9) - no behavior change.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mc_slam_tpu import lie
from mc_slam_tpu.camera import undistort_points
from mc_slam_tpu.frontend import bow, extractor, matching
from mc_slam_tpu.geometry import init2view, pnp
from mc_slam_tpu.imu.navstate import NavState, navstate_identity
from mc_slam_tpu.imu.preintegration import (preint_identity, preintegrate,
                                            predict_navstate)
from mc_slam_tpu.pipeline import loopclosing, mapping, tracking, viinit
from mc_slam_tpu.pipeline.pipebase import (NO_IMAGES_YET, NOT_INITIALIZED, OK,
                                           LOST)
from mc_slam_tpu.slam_map.mapstate import (MapState, covisibility_weights,
                                            empty_map, observation_counts)
from mc_slam_tpu.solver import ba, ba_chunked, ba_vi, ba_vi_idp, factors
from mc_slam_tpu.solver.ba import VisualObs


class LoopCtlMixin:
    # ------------------------------------------------------------------
    # Loop closing (LoopClosing::Run, gated on VI init in IMU mode :75)
    # ------------------------------------------------------------------
    def _loop_gates_open(self):
        """Cheap host-side gates in front of loop detection (LoopClosing::Run
        gating: VI-init done :75; cooldown mnLastLoopKFid+10 :137-141)."""
        if not self.enable_loop_closing:
            return False
        if self.cfg.use_imu and not self.vi_inited:
            return False
        if len(self.kf_slots) < 8:
            return False
        return self.n_kf - getattr(self, "_last_loop_nkf", -100) >= 10

    def _try_close_loop(self, slot, handles=None):
        """Dispatch the per-event loop-closure work. The Sim3 RANSAC batch is
        DISPATCH-ONLY here; its (tiny, packed) result is harvested frames
        later when the async copy has landed (_harvest_sim3) — pulling it
        inline waited out the whole queued keyframe-event device chain
        (~185 ms median measured). Synchronous callers (no handles: depth
        modes, tests) drain immediately."""
        sync = handles is None
        self._harvest_sim3(force=True)      # at most one in-flight batch
        while self._deferred_verify is not None:
            self._harvest_verify(force=True)
        if not self._loop_gates_open():
            return
        act = list(self.kf_slots)
        if slot not in act:
            return
        with self.timers.stage("lc_detect"):
            cands = self.loop.detect(self.m, slot, act,
                                     kf_ids=self.kf_id_host, handles=handles)
        diag = getattr(self.loop, "last_diag", None)
        if diag is not None:
            self.events.append((self.frame_id, "lc_diag", dict(diag)))
        # Sim3 RANSAC validates consistent candidates in turn (ComputeSim3
        # iterates all nInitialCandidates, src/LoopClosing.cpp:277-330).
        # At most 2 streaked + 1 fallback candidate per event; a candidate
        # WITHOUT the 3-consecutive consistency streak must clear a doubled
        # geometric-consensus bar (~ the reference's guided-match total,
        # LoopClosing.cpp:459-498) — inlier count alone is the classic
        # false-loop failure on repetitive scenes.
        streaked = [c for c, s in cands if s][:2]
        fallback = [c for c, s in cands if not s][:1]
        todo = [(c, 20) for c in streaked] + [(c, 40) for c in fallback]
        if not todo:
            return
        # ONE batched device program for every candidate: Sim3 RANSAC +
        # pixel refinement (ComputeSim3, LoopClosing.cpp:277-330). Padded to
        # a fixed candidate count so the program compiles once; pad rows
        # carry an unreachable consensus bar.
        C = 3
        pad = (todo + [(todo[0][0], 1 << 20)] * C)[:C]
        cand_arr = np.asarray([c for c, _ in pad], np.int32)
        bar_arr = np.asarray([b for _, b in pad], np.int32)
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, C)
        with self.timers.stage("lc_sim3"):
            packed = loopclosing.sim3_ransac_batch(
                self.m, keys, jnp.asarray(slot, jnp.int32),
                jnp.asarray(cand_arr), jnp.asarray(bar_arr), self.cam,
                ext=self.ext, fix_scale=self.vi_inited)
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
        # diagnostic trail for precision accounting (eval_clone judges each
        # proposed pair against ground truth): which pairs went to Sim3
        self.events.append((self.frame_id, "sim3_dispatch", dict(
            cur_fid=self.kf_id_host.get(slot, -1),
            cand_fids=[self.kf_id_host.get(int(c), -1) for c, _ in todo])))
        self._deferred_sim3 = {"slot": slot, "cand_arr": cand_arr,
                               "n_todo": len(todo), "packed": packed,
                               "sync": sync}
        if sync:
            self._harvest_sim3(force=True)
            while self._deferred_verify is not None:
                self._harvest_verify(force=True)

    def _harvest_sim3(self, force=False):
        """Consume a landed Sim3 RANSAC batch: guided-group gate on a passing
        candidate, then the loop closure itself (CorrectLoop). Readiness-gated
        like the other deferred keyframe-event stages."""
        p = self._deferred_sim3
        if p is None:
            return
        if not force:
            try:
                if not p["packed"].is_ready():
                    return
            except Exception:
                p["age"] = p.get("age", 0) + 1
                if p["age"] < 4:
                    return
        self._deferred_sim3 = None
        slot = p["slot"]
        if slot not in self.kf_slots or not self._loop_gates_open():
            return
        act = list(self.kf_slots)
        cand_arr = p["cand_arr"]
        with self.timers.stage("lc_sim3_pull"):
            packed = np.asarray(p["packed"])
        ok_a = packed[:, 0] > 0.5
        nin_a = packed[:, 1].astype(np.int64)
        s_a = packed[:, 2]
        R_a = packed[:, 3:12].reshape(-1, 3, 3)
        t_a = packed[:, 12:15]
        passing = []
        for i in range(p["n_todo"]):
            c = int(cand_arr[i])
            if bool(ok_a[i]) and c in self.kf_slots:
                passing.append(dict(c=c, s=float(s_a[i]), R=R_a[i].copy(),
                                    t=t_a[i].copy(), n_in=int(nin_a[i])))
        self.events.append((self.frame_id, "sim3_result", dict(
            cands=[int(c) for c in cand_arr[:p["n_todo"]]],
            n_in=[int(x) for x in nin_a[:p["n_todo"]]],
            ok=[bool(x) for x in ok_a[:p["n_todo"]]])))
        if not passing:
            return
        self._dispatch_verify(slot, passing, 0, p.get("sync", False))

    def _dispatch_verify(self, slot, passing, idx, sync):
        """Guided-reprojection verification over the loop-side covisibility
        GROUP (ComputeSim3, LoopClosing.cpp:459-498) — only for a
        RANSAC-passing candidate (it is a whole-map projection search), and
        DISPATCH-ONLY: the count is harvested frames later (_harvest_verify).
        The old synchronous verify sat on the harvest path and stormed when
        RANSAC passers repeated (10.3 s of blocking pulls in the r4 driver
        run). The guided gate is what rejects aliased places: a pairwise Sim3
        between two visually similar spots passes RANSAC with high consensus,
        but the group's surrounding geometry does not re-project (base drift
        without loops: 5 mm; with unverified closures: 3.6 m, measured).
        Groups come from the detection-time covisibility matrix (a fresh
        per-candidate row would be a device pull each)."""
        cv = passing[idx]
        c = cv["c"]
        W = getattr(self.loop, "last_W", None)
        if W is not None:
            wrow = W[c] * self._active_mask()
            wrow[c] = 0
            nb = [int(k) for k in np.argsort(-wrow)[:4]
                  if wrow[k] >= self.cfg.covis_th]
        else:
            nb = self._covisible(c, 4)
        grp = ([c] + nb + [c] * 5)[:5]
        with self.timers.stage("lc_verify"):
            h = loopclosing.guided_match_count(
                self.m, jnp.asarray(slot, jnp.int32),
                jnp.asarray(c, jnp.int32), jnp.asarray(grp, jnp.int32),
                jnp.asarray(cv["s"]), jnp.asarray(cv["R"]),
                jnp.asarray(cv["t"]), self.cam, ext=self.ext)
            try:
                h.copy_to_host_async()
            except Exception:
                pass
        self._deferred_verify = {"slot": slot, "passing": passing,
                                 "idx": idx, "h": h, "sync": sync}
        if sync:
            self._harvest_verify(force=True)

    def _harvest_verify(self, force=False):
        """Consume a landed guided-match count: accept (apply the closure) or
        move on to the next RANSAC-passing candidate (one dispatch per
        harvest, so a candidate storm costs one deferred program per frame,
        never a blocking pull)."""
        v = self._deferred_verify
        if v is None:
            return
        if not force:
            try:
                if not v["h"].is_ready():
                    return
            except Exception:
                v["age"] = v.get("age", 0) + 1
                if v["age"] < 4:
                    return
        self._deferred_verify = None
        slot = v["slot"]
        if slot not in self.kf_slots or not self._loop_gates_open():
            return
        with self.timers.stage("lc_verify_pull"):
            n_guided = int(np.asarray(v["h"]))
        cv = v["passing"][v["idx"]]
        self.events.append((self.frame_id, "verify_result",
                            dict(cand=cv["c"], n_guided=n_guided,
                                 n_ransac=cv["n_in"])))
        if n_guided >= 40 and cv["c"] in self.kf_slots:
            from mc_slam_tpu.geometry.sim3solver import Sim3Result
            res = Sim3Result(ok=True, s=jnp.asarray(cv["s"]),
                             R=jnp.asarray(cv["R"]), t=jnp.asarray(cv["t"]),
                             inliers=None, n_inliers=cv["n_in"])
            self._apply_closure(slot, cv["c"], res)
            return
        nxt = v["idx"] + 1
        if nxt < len(v["passing"]) and v["passing"][nxt]["c"] in self.kf_slots:
            self._dispatch_verify(slot, v["passing"], nxt, v["sync"])

    def _apply_closure(self, slot, cand, res):
        act = list(self.kf_slots)
        # The RANSAC Sim3 lives in CAMERA frames (loop-cam -> cur-cam);
        # close_loop's vertices are BODY poses, so conjugate by the
        # extrinsics: S_b = Tbc o S_c o Tcb
        Rcb = np.asarray(self.ext.Rcb)
        tcb = np.asarray(self.ext.tcb)
        s_c = float(res.s)
        R_c = np.asarray(res.R)
        t_c = np.asarray(res.t)
        R_b = Rcb.T @ R_c @ Rcb
        t_b = Rcb.T @ (s_c * (R_c @ tcb) + t_c - tcb)
        res = res._replace(R=jnp.asarray(R_b, jnp.float32),
                           t=jnp.asarray(t_b, jnp.float32))
        # implied correction BEFORE the map is touched: how far the measured
        # Sim3 moves the current KF vs its estimate (the drift this closure
        # heals). On a low-drift map a LARGE value = the closure is wrong.
        Pl_np = np.asarray(self.m.kf_ns.P[cand])
        Rl_np = np.asarray(self.m.kf_ns.R[cand])
        Pc_np = np.asarray(self.m.kf_ns.P[slot])
        Rm = np.asarray(res.R); tm = np.asarray(res.t); sm = float(res.s)
        # Scw convention of close_loop: vertex = (R^T, -R^T P); the loop edge
        # demands Scw_cur = S_lc o Scw_loop -> implied current position
        Rcw_l = Rl_np.T
        tcw_l = -Rcw_l @ Pl_np
        R_cur_impl = Rm @ Rcw_l
        t_cur_impl = sm * (Rm @ tcw_l) + tm
        P_cur_impl = -(R_cur_impl.T @ t_cur_impl) / max(sm, 1e-9)
        corr_m = float(np.linalg.norm(P_cur_impl - Pc_np))
        self.m = loopclosing.close_loop(self.m, act, slot, cand, res, self.cam,
                                        fix_scale=self.vi_inited,
                                        loop_edges=self.loop_edges,
                                        mesh=self.mesh_e)
        # unordered-pair membership guard (ADVICE r4): a re-closure of the
        # same KF pair after the cooldown must not duplicate the edge
        pair = (min(cand, slot), max(cand, slot))
        if pair not in {(min(a, b), max(a, b)) for a, b in self.loop_edges}:
            self.loop_edges.append((cand, slot))
        self.events.append((self.frame_id, "loop",
                            dict(cur=slot, cand=cand,
                                 cur_fid=self.kf_id_host.get(slot, -1),
                                 cand_fid=self.kf_id_host.get(cand, -1),
                                 n_inliers=int(res.n_inliers),
                                 corr_m=round(corr_m, 3),
                                 s=round(float(res.s), 4))))
        self.n_loops_closed += 1
        self._last_loop_nkf = self.n_kf
        # cross-seam fusion (CorrectLoop dedup + SearchAndFuse,
        # src/LoopClosing.cpp:641-665,732-764): project each side's points
        # into the other side's KFs and merge duplicate landmarks, so
        # covisibility bridges the seam and the follow-up BA can co-constrain
        # the two halves.
        from mc_slam_tpu.slam_map.mapstate import observation_counts as _oc
        obs_n = _oc(self.m)
        cur_side = [slot] + [s for s in self._covisible(slot, 4) if s != cand]
        loop_side = [cand] + [s for s in self._covisible(cand, 4)
                              if s != slot and s not in cur_side]
        # radius 4 px as the reference's SearchAndFuse(th=4) for
        # Sim3-corrected projections (src/LoopClosing.cpp:732-764) — the
        # residual seam error right after the pose-graph correction is larger
        # than steady-state fusion's
        for a in loop_side[:3]:
            for b in cur_side[:3]:
                self.m, _ = mapping.fuse_into_keyframe(
                    self.m, jnp.asarray(a), jnp.asarray(b), self.cam,
                    self.ext, radius=4.0, obs_n=obs_n)
                self.m, _ = mapping.fuse_into_keyframe(
                    self.m, jnp.asarray(b), jnp.asarray(a), self.cam,
                    self.ext, radius=4.0, obs_n=obs_n)
        # full BA after the pose-graph correction (RunGlobalBundleAdjustment)
        self._local_ba(force_all=True, prune=False)
        # second fusion round on the REFINED geometry: right after the pose
        # graph the residual seam error still scatters matches outside the
        # window; post-GBA the projections line up and the remaining
        # duplicates merge (the reference gets this implicitly — its GBA
        # thread finishes long after SearchAndFuse and the next keyframes'
        # SearchInNeighbors rounds keep fusing the healed seam)
        obs_n = _oc(self.m)
        for a in loop_side[:2]:
            for b in cur_side[:2]:
                self.m, _ = mapping.fuse_into_keyframe(
                    self.m, jnp.asarray(a), jnp.asarray(b), self.cam,
                    self.ext, radius=4.0, obs_n=obs_n)
                self.m, _ = mapping.fuse_into_keyframe(
                    self.m, jnp.asarray(b), jnp.asarray(a), self.cam,
                    self.ext, radius=4.0, obs_n=obs_n)
        self.last_pose = self._kf_body_pose(slot)
        if self.vi_inited:
            self.last_ns = jax.tree_util.tree_map(
                lambda a: a[slot], self.m.kf_ns)
            self.prior = None
        self.velocity = (jnp.zeros(3), jnp.eye(3))

