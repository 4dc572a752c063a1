"""SLAM system facade + host orchestrator.

Replaces System (src/System.cpp) and the thread state machines of Tracking /
LocalMapping (src/Tracking.cpp:799-1228, src/LocalMapping.cpp:988-1099) with a
deterministic single-loop pipeline (the reference's non-realtime mode,
test.RealTime: 0): per frame — extract, track; per keyframe — map-point culling,
triangulation with neighbors, fusion, local BA, keyframe culling; VI
initialization after enough keyframe baseline. The map lives on device as a
MapState; the host holds only scalars and small python state (state machine,
cursors, IMU buffers).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mc_slam_tpu import lie
from mc_slam_tpu.camera import Camera, undistort_points
from mc_slam_tpu.frontend import extractor, matching
from mc_slam_tpu.frontend.extractor import Features
from mc_slam_tpu.geometry import init2view
from mc_slam_tpu.imu.navstate import NavState, navstate_identity
from mc_slam_tpu.imu.preintegration import (IMUNoise, euroc_noise, preint_identity,
                                            preintegrate, predict_navstate)
from mc_slam_tpu.frontend import bow
from mc_slam_tpu.geometry import pnp
from mc_slam_tpu.pipeline import loopclosing, mapping, tracking, viinit
from mc_slam_tpu.pipeline.trajstore import TrajStore
from mc_slam_tpu.solver import ba_chunked, ba_vi_idp
from mc_slam_tpu.slam_map.mapstate import (MapState, covisibility_weights,
                                            empty_map, observation_counts)
from mc_slam_tpu.solver import ba, ba_vi, factors
from mc_slam_tpu.solver.ba import VisualObs

# tracking state machine (include/Tracking.h:113-120)
NO_IMAGES_YET, NOT_INITIALIZED, OK, LOST = range(4)


@dataclasses.dataclass
class SlamConfig:
    max_kf: int = 128
    max_mp: int = 4096
    n_feat: int = 512
    n_levels: int = 4
    local_window: int = 10          # VI local window (EuRoC uses 20)
    ba_window: int = 8              # covisible KFs in visual local BA
    min_init_matches: int = 60
    min_track_inliers: int = 12
    kf_min_gap: int = 3             # frames
    kf_max_gap: int = 20
    kf_ref_ratio: float = 0.8       # NeedNewKeyFrame ratio (src/Tracking.cpp:1865)
    covis_th: int = 15              # covisibility edge weight (src/KeyFrame.cpp:668)
    max_imu_per_kf: int = 256
    vi_init_time: float = 15.0      # seconds (config/euroc.yaml:6)
    vi_init_max_cond: float = 5e4   # step-3 system condition-number acceptance
    vi_init_scale_tol: float = 0.5  # |s - s_star| / s agreement (steps 2 vs 3)
    g_mag: float = 9.81
    use_imu: bool = False
    # VI local-window BA uses the anchored inverse-depth form (the reference's
    # production back end, LocalBAPRVIDP src/Optimizer.cpp:32); XYZ remains for
    # visual-only, global, and depth-sensor problems
    use_idp_ba: bool = True
    # early-termination threshold for window-BA LM iterations: once an accepted
    # step improves cost by < ba_rtol relative, the remaining scan iterations
    # no-op (the synchronous analog of the reference's mbAbortBA budget,
    # src/LocalMapping.cpp:1112). 0 disables. CAUTION: monocular-VI scale is a
    # low-gradient mode — relative-cost early exit can leave it under-
    # converged every window and the map scale drifts; keep 0 unless the
    # mapping budget demands it.
    ba_rtol: float = 0.0
    # per-frame pose-only LM early-exit (same mechanism, tracking path)
    track_rtol: float = 0.0
    # refresh distinctive descriptors + normals/scale ranges after fusion
    refresh_stats: bool = True
    stereo_baseline: float = 0.11   # meters (EuRoC-like rig)
    cull_min_obs: int = 3           # 3 mono, 2 for depth sensors (nThObs)
    seed: int = 0


class SlamSystem:
    """Monocular (+IMU) SLAM engine. Feed frames with `track(img, t[, imu])`."""

    def __init__(self, cam: Camera, cfg: SlamConfig = None,
                 Tbc: Optional[np.ndarray] = None, noise: IMUNoise = None):
        self.cam = cam
        self.cfg = cfg or SlamConfig()
        self._Tbc = Tbc
        self.ext = (factors.extrinsics_from_Tbc(Tbc) if Tbc is not None
                    else factors.identity_extrinsics())
        self.noise = noise or euroc_noise()
        self.m = empty_map(self.cfg.max_kf, self.cfg.max_mp, self.cfg.n_feat)
        self.state = NO_IMAGES_YET
        self.key = jax.random.PRNGKey(self.cfg.seed)

        # host bookkeeping
        self.frame_id = 0
        self.n_kf = 0
        self.last_kf_slot = -1
        self.last_kf_frame = 0
        self.kf_slots: list[int] = []        # active slots in insertion order
        self.free_slots: list[int] = []      # culled slots available for reuse
        self.next_fresh_slot = 0             # high-water mark of slot allocation
        self.kf_imu_raw: dict[int, np.ndarray] = {}  # slot -> (T,7) since prev KF
        # host mirrors of immutable per-KF scalars (each bool()/float()/int()
        # on a device element is a full round trip on a remote-attached chip)
        self.kf_time_host: dict[int, float] = {}
        self.kf_id_host: dict[int, int] = {}

        # per-frame state
        self.sensor_depth = False       # becomes True in stereo/RGB-D mode
        self.init_feats: Features | None = None
        self.init_uv: jnp.ndarray | None = None
        self.last_feats: Features | None = None
        # (feat_mp, feat_angle) of the last successfully tracked frame: the
        # angle source for the frame-to-frame rotation-consistency prune
        # (tracking.last_frame_angles); None disables the prune for one frame
        # (first frame, after loss/reloc)
        self._prev_match = None
        self.last_pose = (jnp.zeros(3), jnp.eye(3))   # body P, R (world-from-body)
        self.last_ns: NavState = navstate_identity()
        self.velocity = (jnp.zeros(3), jnp.eye(3))    # relative motion model
        self.last_time = 0.0

        # VI state
        self.vi_inited = False
        self.gw = jnp.asarray([0.0, 0.0, -self.cfg.g_mag])
        # (frame_id, rows) blocks: deferred keyframe cuts take exactly the
        # rows with frame_id <= the keyframe's frame (see _insert_kf_raw)
        self.imu_since_kf: list[tuple[int, np.ndarray]] = []
        self.imu_since_frame: list[tuple[int, np.ndarray]] = []
        self.first_kf_time = None
        self.prior: ba_vi.PriorFactor | None = None
        # post-relocalization bias re-estimation window (the reference's
        # mbRelocBiasPrepare 20-frame buffer, src/Tracking.cpp:47-220,1075-1106)
        self.reloc_buf: list | None = None
        self.reloc_window = 20
        # KF slots whose preintegration-from-previous spans a reloc gap: their
        # PRV/bias edges are disabled (the raw IMU across a kidnap/dropout is
        # not a valid constraint)
        self.broken_chain_slots: set[int] = set()
        self._chain_break_pending = False

        # per-frame trajectory stored RELATIVE to the reference keyframe at
        # track time (Tracking::mlRelativeFramePoses, src/Tracking.cpp:279 and
        # System::SaveTrajectoryTUM): composing against the CURRENT keyframe
        # poses at save time propagates VI-init rescaling, loop corrections,
        # and GBA refinements to every past frame. Rows live on DEVICE
        # (TrajStore) — a per-frame host pull would be a tunnel round trip.
        self.traj = TrajStore()
        # in-flight fused frame steps, oldest first (see _harvest_pending).
        # LAG=2: a frame's summary is consumed two frames after dispatch —
        # by then its async device->host copy has landed, so the hot loop
        # pays ~0 for it (a lag-1 pull still waited most of a tunnel round
        # trip: dispatch->compute->copy takes longer than one frame period)
        import collections
        self._pendings: "collections.deque[dict]" = collections.deque()
        # Pipeline depth is ADAPTIVE between LAG_MIN and LAG_MAX: a frame is
        # harvested once its summary copy has actually landed (is_ready), so
        # the depth self-tunes to the device's real dispatch->result latency.
        # Through a remote-attached chip that latency is ~RTT + compute
        # (~30 ms) while host dispatch is ~1 ms — a fixed depth of 2 blocked
        # ~25 ms per frame waiting for the copy. LAG_MAX bounds decision
        # staleness (keyframe insertion / LOST detection at most LAG_MAX
        # frames late); LAG_MIN keeps the old floor so decision latency stays
        # minimal when the device is the bottleneck.
        # LAG_MIN=1: harvest an entry as soon as its summary copy has landed
        # (is_ready) — with readiness gating an eager harvest never blocks,
        # and decisions (LOST, keyframe) land at minimum latency. Entries
        # may be two-frame pairs, so a count of 2 would double loss-surface
        # latency (tests pin it at <= 3 frames, the reference's immediacy).
        self.LAG_MIN = 1
        import os as _os
        # depth 8: the device transport caps useful in-flight programs — at
        # depth 16 the DISPATCH call itself starts blocking (track stage mean
        # 6 -> 46 ms measured) and the loop runs slower than at 8. The fused
        # frame program is ~1-2 ms of device time; the ~30 ms tunnel round
        # trip is the per-frame floor the depth must cover.
        self.LAG_MAX = int(_os.environ.get("MC_SLAM_LAG_MAX", "8"))
        # frames fused per dispatch post-VI-init (frame_pipeline_vi_pair):
        # the steady frame rate is tunnel-round-trips-per-frame bound
        self.PAIR = int(_os.environ.get("MC_SLAM_PAIR", "2"))
        self._pair_buf: list | None = None
        # deferred tail of the last keyframe event (stats + loop detection)
        self._deferred_event: dict | None = None
        # in-flight Sim3 RANSAC batch for loop candidates (_harvest_sim3)
        self._deferred_sim3: dict | None = None
        # in-flight guided-verification count (_harvest_verify)
        self._deferred_verify: dict | None = None
        self._map_epoch = 0
        self.n_lost_frames = 0
        # diagnostic event log: (frame_id, kind, detail) — closures, losses,
        # relocalizations, VI init (the reference's cout breadcrumbs)
        self.events: list[tuple] = []

        # place recognition (loop closing + relocalization): the shipped
        # trained vocabulary when present (assets/vocab.npz), else random
        self.loop = loopclosing.LoopDetector(
            bow.load_default_vocab(jax.random.PRNGKey(self.cfg.seed + 1)),
            self.cfg.max_kf)
        self.n_loops_closed = 0
        # persistent loop edges [(slot_a, slot_b)]: every accepted closure,
        # re-included in each subsequent essential-graph optimization
        # (LoopClosing.cpp:710-711, Optimizer.cpp:4413-4420); the KFs carrying
        # them are protected from culling (the reference's SetNotErase)
        self.loop_edges: list[tuple[int, int]] = []
        self.enable_loop_closing = True
        self.localization_only = False   # Activate/DeactivateLocalizationMode

        # observability (SURVEY.md section 5): per-stage timers + optional
        # VI-init diagnostic file streaming (plotinit.py-compatible)
        from mc_slam_tpu.utils.metrics import StageTimer
        self.timers = StageTimer()
        # per-frame constants staged once (every eager jnp.asarray is a
        # host->device upload on a remote-attached chip)
        self._c0i = jnp.asarray(0, jnp.int32)
        self._c1f = jnp.asarray(1.0, jnp.float32)
        self._fresh_fb = jnp.asarray(self._fresh_prior_info(1e2), jnp.float32)
        self._prior_fresh_1e3 = jnp.asarray(self._fresh_prior_info(1e3),
                                            jnp.float32)
        self._zero_fmp = jnp.full(self.cfg.n_feat, -1, jnp.int32)
        self._zero_ang = jnp.zeros(self.cfg.n_feat, jnp.float32)
        self._cur_feat_mp = self._zero_fmp
        self._cur_inliers = 0
        self.viinit_log = None      # set to utils.metrics.VIInitLog(dir) to enable

    # ------------------------------------------------------------------
    @property
    def _bf(self):
        """fx * baseline (the reference's mbf)."""
        return float(self.cam.fx) * self.cfg.stereo_baseline

    def _undistort(self, feats: Features):
        return undistort_points(self.cam, feats.xy)

    def upload(self, img):
        """Asynchronously stage a frame on the device ahead of `track`.

        Returns a device array that `track` accepts directly. uint8 input is
        uploaded as-is (4x less host->device bandwidth than float32; the
        extractor casts on device). Callers with a frame of lookahead should
        upload frame n+1 before tracking frame n so the transfer overlaps
        tracking compute (the TPU-native replacement for the reference's
        blocking cv::imread in the driver loop)."""
        if isinstance(img, jax.Array):
            return img
        a = np.asarray(img)
        if a.dtype not in (np.uint8, np.float32):
            a = a.astype(np.float32)
        return jax.device_put(a)

    def track(self, img, t, imu=None, depth=None, img_right=None):
        """Process one frame. img: (H,W) float32 or uint8 (host array, or a
        device array staged by `upload`); t: time; imu: (T,7) rows
        [gyro, acc, dt] since the previous frame (VI mode); depth: optional
        (H,W) metric depth map (RGB-D mode, TrackRGBD); img_right: optional
        rectified right image (stereo mode, TrackStereo).

        Hot path (monocular, state OK): ONE fused device dispatch
        (tracking.frame_pipeline_vi / frame_pipeline_visual) and ZERO blocking
        pulls — the previous frame's summary is harvested at the START of the
        next call (by then its async host copy has landed), and keyframe-rate
        work runs there. This is the TPU-native shape of the reference's
        tracking thread + LocalMapping/LoopClosing threads
        (src/System.cpp:191-203): tracking never waits for its own scalars,
        and map updates happen between frames at keyframe rate."""
        cfg = self.cfg
        # deferred decisions for in-flight frames (may run KF events /
        # VI init / declare LOST) — BEFORE this frame's IMU is appended, so a
        # keyframe cut at a previous frame gets exactly its own IMU span
        self._harvest_pending()
        if imu is not None and len(imu):
            rows = np.asarray(imu, np.float32)
            self.imu_since_kf.append((self.frame_id, rows))
            self.imu_since_frame.append((self.frame_id, rows))
        depth_mode = depth is not None or img_right is not None
        if self.state == OK and not depth_mode and self.reloc_buf is None:
            # fused async hot path
            with self.timers.stage("track"):
                if self.vi_inited:
                    if self.PAIR > 1:
                        self._pair_push(self.upload(img), t)
                    else:
                        self._dispatch_frame_vi(self.upload(img), t)
                else:
                    self._dispatch_frame_visual(self.upload(img), t)
            self.last_time = t
            self.frame_id += 1
            return True      # optimistic; a lost frame surfaces next call
        # mode transition (init/reloc/depth): drain every in-flight frame
        # before synchronous processing
        self._harvest_pending(drain=True)
        return self._track_sync(img, t, depth, img_right)

    def _track_sync(self, img, t, depth=None, img_right=None):
        """Synchronous per-frame path: initialization, relocalization, the
        post-reloc bias window, and stereo/RGB-D modes (each needs host
        decisions mid-frame; none is frame-rate-critical in steady state)."""
        cfg = self.cfg
        with self.timers.stage("extract"):
            feats = extractor.extract(self.upload(img),
                                      n_features=cfg.n_feat, n_levels=cfg.n_levels)
            uv = self._undistort(feats)
        feat_depth = self._feature_depth(feats, uv, depth, img_right)
        # virtual right-image u coordinate (the reference's mvuRight, mbf/z):
        # the metric-depth residual row for stereo/RGB-D BA
        if feat_depth is not None:
            self.sensor_depth = True
            d = jnp.maximum(feat_depth, 1e-6)
            self._cur_ur = jnp.where(
                feat_depth > 1e-3,
                uv[:, 0] - float(self.cam.fx) * self.cfg.stereo_baseline / d,
                -1.0)
        else:
            self._cur_ur = None
        ok = False
        if self.state == NO_IMAGES_YET:
            if feat_depth is not None:
                ok = self._initialize_from_depth(feats, uv, feat_depth, t)
            else:
                self.init_feats, self.init_uv = feats, uv
                self.state = NOT_INITIALIZED
        elif self.state == NOT_INITIALIZED:
            if feat_depth is not None:
                ok = self._initialize_from_depth(feats, uv, feat_depth, t)
            else:
                ok = self._try_initialize(feats, uv, t)
        else:
            if self.state == LOST:
                # once LOST, go straight to relocalization (Track() does the
                # same, src/Tracking.cpp:886-890) — running IMU/visual tracking
                # from a garbage pose can "accept" on accidental inliers and
                # corrupt the carried biases
                with self.timers.stage("relocalize"):
                    ok = self._relocalize(feats, uv, t)
                    if ok:
                        self._invalidate_frame_caches()
            else:
                with self.timers.stage("track"):
                    ok = self._track_frame(feats, uv, t)
                if not ok and self.state == LOST:
                    with self.timers.stage("relocalize"):
                        ok = self._relocalize(feats, uv, t)
                        if ok:
                            self._invalidate_frame_caches()
            if ok and not self.localization_only and self._need_new_kf():
                with self.timers.stage("local_mapping"):
                    slot = self._create_keyframe(feats, uv, t)
                    if feat_depth is not None:
                        self._add_depth_points(slot, feats, uv, feat_depth)
                    self._local_mapping()
                with self.timers.stage("loop_closing"):
                    self._try_close_loop(slot)
                self._invalidate_frame_caches()
            if ok and not self.vi_inited and cfg.use_imu:
                with self.timers.stage("vi_init"):
                    self._maybe_vi_init(t)
                    if self.vi_inited:
                        self._invalidate_frame_caches()
        self.last_feats = feats
        self.last_time = t
        if self.state == OK:
            self._record_traj_sync(t)
        elif self.state == LOST:
            self.n_lost_frames += 1
        self.frame_id += 1
        return ok

    # ------------------------------------------------------------------
    # Fused async per-frame path
    # ------------------------------------------------------------------
    def _anchor_slot(self):
        k = self.last_kf_slot
        if k is not None and k in self.kf_slots:
            return k, self.kf_id_host[k]
        return -1, -1

    def _record_traj_sync(self, t):
        """Trajectory row for a synchronously-tracked frame (one small
        dispatch; these paths are off the hot loop)."""
        k, kid = self._anchor_slot()
        P, R = self.last_pose
        row = self._traj_row_jit(self.m, P, R,
                                 jnp.asarray(max(k, 0), jnp.int32))
        if k < 0:
            row = (jnp.zeros(3), jnp.eye(3), row[2], row[3])
        self.traj.append(row, t, k, kid)

    @property
    def _traj_row_jit(self):
        fn = getattr(self, "_traj_row_jit_", None)
        if fn is None:
            fn = jax.jit(tracking._traj_row)
            self._traj_row_jit_ = fn
        return fn

    def _capture_imu_frame(self):
        """Consume the per-frame IMU buffer into a fixed-size raw array."""
        cfg = self.cfg
        rows = self._imu_rows(self.imu_since_frame)
        rows = rows[-cfg.max_imu_per_kf:]
        rawp = np.zeros((cfg.max_imu_per_kf, 7), np.float32)
        rawp[:len(rows)] = rows
        self.imu_since_frame = []
        return rawp

    def _state_backup(self):
        return (self.last_ns, self.prior, self.last_pose, self.velocity,
                self._prev_match, self.m.mp_found, self.m.mp_visible,
                self._cur_feat_mp)

    def _pair_push(self, img, t):
        """N-frame fusion (PAIR=N): buffer VI frames; dispatch all N as ONE
        fused device program on the Nth (frame_pipeline_vi_pair). Every
        dispatch->result round trip through a remote-attached chip is ~25 ms
        against ~2 ms of device compute per frame, so round trips per frame
        — not compute — set the steady frame rate; N-frame fusion divides
        them by N."""
        rawp = self._capture_imu_frame()
        dt_f = np.float32(max(t - self.last_time, 1e-3))
        if self._pair_buf is None:
            self._pair_buf = []
        self._pair_buf.append(dict(img=img, t=t, rawp=rawp, dt=dt_f,
                                   fid=self.frame_id,
                                   backup=(self._state_backup()
                                           if not self._pair_buf else None)))
        if len(self._pair_buf) >= self.PAIR:
            bufs = self._pair_buf
            self._pair_buf = None
            self._dispatch_frame_vi_pair(bufs)

    def _flush_pair_buf(self):
        """Dispatch buffered sub-batch frames singly (drain path)."""
        bufs = getattr(self, "_pair_buf", None)
        if not bufs:
            self._pair_buf = None
            return
        self._pair_buf = None
        for buf in bufs:
            self._dispatch_frame_vi(buf["img"], buf["t"], rawp=buf["rawp"],
                                    dt_f=buf["dt"], fid=buf["fid"])

    def _dispatch_frame_vi_pair(self, bufs):
        cfg = self.cfg
        if self.prior is None:
            self.prior = ba_vi.PriorFactor(
                cam=self._c0i, ns0=self.last_ns,
                info=self._prior_fresh_1e3, valid=self._c1f)
        pfm, pan = (self._prev_match if self._prev_match is not None
                    else (self._zero_fmp, self._zero_ang))
        k, kid = self._anchor_slot()
        imgs = tuple(b["img"] for b in bufs)
        rawps = np.stack([b["rawp"] for b in bufs])
        dts = np.asarray([b["dt"] for b in bufs], np.float32)
        (frames, Hp_last, mp_found, mp_vis,
         summary) = tracking.frame_pipeline_vi_pair(
            self.m, imgs, rawps, self.cam,
            self.ext, self.noise, self.last_ns, self.gw, self.prior, pfm,
            pan, np.int32(max(k, 0)), dts, self._fresh_fb,
            sigma_bg=float(self.noise.sigma_bg),
            sigma_ba=float(self.noise.sigma_ba),
            n_features=cfg.n_feat, n_levels=cfg.n_levels,
            rtol=cfg.track_rtol, has_prev=self._prev_match is not None)
        try:
            summary.copy_to_host_async()
        except Exception:
            pass
        feats_z, uv_z, fmp_z, ns_z, _ = frames[-1]
        self.last_ns = ns_z
        self.last_pose = (ns_z.P, ns_z.R)
        self.prior = ba_vi.PriorFactor(cam=self._c0i, ns0=ns_z, info=Hp_last,
                                       valid=self._c1f)
        self._cur_feat_mp = fmp_z
        self._prev_match = (fmp_z, feats_z.angle)
        self.m = self.m._replace(mp_found=mp_found, mp_visible=mp_vis)
        self.last_feats = feats_z
        row_0 = len(self.traj.meta)
        for b, (feats, uv, fmp, ns, traj) in zip(bufs, frames):
            self.traj.append(traj, b["t"], k, kid)
        self._pendings.append(dict(
            mode="vi2", row=row_0, summary=summary,
            backup=bufs[0]["backup"], epoch=self._map_epoch,
            frames=tuple(
                dict(feats=feats, uv=uv, t=b["t"], frame_id=b["fid"],
                     feat_mp=fmp, pose=(ns.P, ns.R), ns=ns)
                for b, (feats, uv, fmp, ns, _) in zip(bufs, frames))))

    def _dispatch_frame_vi(self, img, t, rawp=None, dt_f=None, fid=None,
                           backup=None):
        """Dispatch the fused VI frame program; no host sync."""
        cfg = self.cfg
        if rawp is None:
            rawp = self._capture_imu_frame()
        if self.prior is None:
            self.prior = ba_vi.PriorFactor(
                cam=self._c0i, ns0=self.last_ns,
                info=self._prior_fresh_1e3, valid=self._c1f)
        pfm, pan = (self._prev_match if self._prev_match is not None
                    else (self._zero_fmp, self._zero_ang))
        k, kid = self._anchor_slot()
        if dt_f is None:
            dt_f = np.float32(max(t - self.last_time, 1e-3))
        if backup is None:
            backup = self._state_backup()
        (feats, uv, ns2, feat_mp, H_prior, mp_found, mp_vis, traj_row,
         summary) = tracking.frame_pipeline_vi(
            self.m, img, rawp, self.cam, self.ext, self.noise, self.last_ns,
            self.gw, self.prior, pfm, pan,
            np.int32(max(k, 0)), dt_f, self._fresh_fb,
            sigma_bg=float(self.noise.sigma_bg),
            sigma_ba=float(self.noise.sigma_ba),
            n_features=cfg.n_feat, n_levels=cfg.n_levels,
            rtol=cfg.track_rtol, has_prev=self._prev_match is not None)
        try:
            summary.copy_to_host_async()
        except Exception:
            pass
        # optimistic state update (rolled back at harvest if the frame was
        # actually lost)
        self.last_ns = ns2
        self.last_pose = (ns2.P, ns2.R)
        self.prior = ba_vi.PriorFactor(cam=self._c0i, ns0=ns2, info=H_prior,
                                       valid=self._c1f)
        self._cur_feat_mp = feat_mp
        self._prev_match = (feat_mp, feats.angle)
        self.m = self.m._replace(mp_found=mp_found, mp_visible=mp_vis)
        self.last_feats = feats
        self.traj.append(traj_row, t, k, kid)
        self._pendings.append(dict(
            mode="vi", row=len(self.traj.meta) - 1, summary=summary, feats=feats, uv=uv,
                             t=t,
                             frame_id=self.frame_id if fid is None else fid,
                             backup=backup,
                             epoch=self._map_epoch, feat_mp=feat_mp,
                             pose=(ns2.P, ns2.R), ns=ns2))

    def _dispatch_frame_visual(self, img, t):
        """Dispatch the fused visual frame program; no host sync."""
        cfg = self.cfg
        self.imu_since_frame = []     # pre-init per-frame IMU is unused
        P_last, R_last = self.last_pose
        dP, dR = self.velocity
        pfm, pan = (self._prev_match if self._prev_match is not None
                    else (self._zero_fmp, self._zero_ang))
        k, kid = self._anchor_slot()
        backup = (self.last_ns, self.prior, self.last_pose, self.velocity,
                  self._prev_match, self.m.mp_found, self.m.mp_visible,
                  self._cur_feat_mp)
        (feats, uv, res, vel, mp_found, mp_vis, traj_row,
         summary) = tracking.frame_pipeline_visual(
            self.m, img, self.cam, self.ext, P_last, R_last, dP, dR,
            pfm, pan, np.int32(max(k, 0)),
            np.int32(cfg.min_track_inliers),
            n_features=cfg.n_feat, n_levels=cfg.n_levels,
            rtol=cfg.track_rtol, has_prev=self._prev_match is not None)
        try:
            summary.copy_to_host_async()
        except Exception:
            pass
        self.velocity = vel
        self.last_pose = (res.P, res.R)
        self._cur_feat_mp = res.feat_mp
        self._prev_match = (res.feat_mp, feats.angle)
        self.m = self.m._replace(mp_found=mp_found, mp_visible=mp_vis)
        self.last_feats = feats
        self.traj.append(traj_row, t, k, kid)
        self._pendings.append(dict(
            mode="vis", row=len(self.traj.meta) - 1, summary=summary, feats=feats, uv=uv,
                             t=t, frame_id=self.frame_id, backup=backup,
                             epoch=self._map_epoch, feat_mp=res.feat_mp,
                             pose=(res.P, res.R),
                             pose_before=(P_last, R_last)))

    def _rollback_pending(self, p):
        # drop this frame's trajectory row and every newer in-flight frame's
        # (they were dispatched from the lost state)
        self.traj.truncate(p["row"])
        self.n_lost_frames += sum(2 if q["mode"] == "vi2" else 1
                                  for q in self._pendings)
        self._pendings.clear()
        if self._pair_buf:
            self.n_lost_frames += len(self._pair_buf)
        self._pair_buf = None
        if p.get("epoch") != self._map_epoch:
            # a keyframe event / closure / VI init re-seated the tracking
            # state after this frame was dispatched: the dispatch-time backup
            # is stale — keep the newer (post-event) state and only drop the
            # frame (relocalization re-seats the pose anyway)
            return
        (self.last_ns, self.prior, self.last_pose, self.velocity,
         self._prev_match, mp_found, mp_vis, self._cur_feat_mp) = p["backup"]
        self.m = self.m._replace(mp_found=mp_found, mp_visible=mp_vis)

    def _summary_ready(self, p):
        try:
            return bool(p["summary"].is_ready())
        except Exception:
            # backend without is_ready: fall back to the fixed-depth rule
            return True

    def _harvest_pending(self, drain=False):
        """Apply the deferred decisions for due in-flight frames: LOST
        transition, keyframe insertion (+ local mapping, loop closing), and
        the VI-init attempt. A frame is due once its async summary copy has
        landed (and at least LAG_MIN newer frames are in flight), or
        unconditionally at depth LAG_MAX — the hot loop blocks only when the
        pipeline is genuinely full. drain=True consumes everything (mode
        transitions, flush)."""
        if drain:
            self._flush_pair_buf()
        self._harvest_event(force=drain)
        self._harvest_sim3(force=drain)
        self._harvest_verify(force=drain)
        # deep pipelining only once VI-initialized: during the visual
        # bootstrap the map is small and keyframes come every few frames —
        # deferring insertion/LOST decisions by LAG_MAX frames there starves
        # tracking of new triangulations and causes relocalization storms
        # (measured on the euroc clone: 8 relocs in the first 200 frames at
        # depth 8 vs 0 at depth 2). Post-init, IMU-predicted tracking
        # tolerates the deeper queue and the depth hides the tunnel RTT.
        lag_max = self.LAG_MAX if self.vi_inited else 2
        while self._pendings and (
                drain or len(self._pendings) >= lag_max
                or (len(self._pendings) >= self.LAG_MIN
                    and self._summary_ready(self._pendings[0]))):
            self._harvest_one()

    def _harvest_one(self):
        p = self._pendings.popleft()
        cfg = self.cfg
        if p["mode"] == "vi2":
            return self._harvest_pair(p)
        # stall attribution: a pull on a landed copy is ~free; one on a
        # not-yet-ready summary blocks on the whole in-flight device queue
        name = ("harvest_pull" if self._summary_ready(p)
                else "harvest_pull_block")
        with self.timers.stage(name):
            s = np.asarray(p["summary"])
        n_in = int(s[0])
        if p["mode"] == "vi":
            if n_in < max(6, cfg.min_track_inliers // 2):
                self._rollback_pending(p)
                self._prev_match = None
                self.state = LOST
                self.n_lost_frames += 1
                self.events.append((p["frame_id"], "lost",
                                    dict(mode="vi", n_in=n_in)))
                return
        else:
            if n_in < cfg.min_track_inliers:
                # motion-prior-free fallback against the reference keyframe
                # (TrackReferenceKeyFrame, src/Tracking.cpp:1524) — host-side
                # (PnP RANSAC); rare, so the round trips are acceptable.
                # With newer frames in flight, their dispatches rode this
                # frame's (bad) pose: discard them too and re-track.
                res2 = self._track_reference_kf(p["feats"], p["uv"])
                if res2 is None:
                    self._rollback_pending(p)
                    self._prev_match = None
                    self.state = LOST
                    self.n_lost_frames += 1
                    self.events.append((p["frame_id"], "lost",
                                        dict(mode="vis", n_in=n_in)))
                    return
                n_in = int(res2.n_inliers)
                # newer in-flight frames rode the bad pose: drop them and
                # re-seat tracking on the fallback solution
                self.traj.truncate(p["row"] + 1)
                self.n_lost_frames += len(self._pendings)
                self._pendings.clear()
                P_last, R_last = p["pose_before"]
                RlT = jnp.swapaxes(R_last, -1, -2)
                self.velocity = ((RlT @ (res2.P - P_last)[..., None])[..., 0],
                                 RlT @ res2.R)
                self.last_pose = (res2.P, res2.R)
                self._cur_feat_mp = res2.feat_mp
                self._prev_match = (res2.feat_mp, p["feats"].angle)
                _, _, _, _, _, mf, mv, _ = p["backup"]
                vis_mask = jnp.zeros(self.m.P, bool).at[
                    jnp.clip(res2.feat_mp, 0, self.m.P - 1)].set(
                        res2.feat_mp >= 0, mode="drop")
                self.m = mapping.update_found_visible(
                    self.m._replace(mp_found=mf, mp_visible=mv),
                    vis_mask, vis_mask)
                k, kid = self._anchor_slot()
                row = self._traj_row_jit(self.m, res2.P, res2.R,
                                         jnp.asarray(max(k, 0), jnp.int32))
                self.traj.replace_at(p["row"], row)
                # the pending's dispatch-time snapshot holds the REJECTED
                # motion-model result; a keyframe created below must carry
                # the fallback solution (pose + associations), not the bad
                # one (ADVICE r4: map corruption exactly when the visual
                # bootstrap is struggling)
                p["pose"] = (res2.P, res2.R)
                p["feat_mp"] = res2.feat_mp
        self._cur_inliers = n_in
        if (not self.localization_only
                and p.get("epoch") == self._map_epoch
                and self._need_new_kf(fid=p["frame_id"])):
            with self.timers.stage("local_mapping"):
                with self.timers.stage("lm_insert"):
                    slot = self._create_keyframe(p["feats"], p["uv"], p["t"],
                                                 fid=p["frame_id"],
                                                 pose=p.get("pose"),
                                                 ns=p.get("ns"),
                                                 feat_mp=p.get("feat_mp"))
                self._local_mapping()
            # loop detection was dispatched at the event's end; its result is
            # harvested (and any closure applied) at the NEXT frame's harvest
            self._invalidate_frame_caches()
        if not self.vi_inited and cfg.use_imu:
            with self.timers.stage("vi_init"):
                self._maybe_vi_init(p["t"])
                if self.vi_inited:
                    self._invalidate_frame_caches()

    def _harvest_pair(self, p):
        """Deferred decisions for a fused two-frame dispatch: one summary
        pull covers both frames; LOST / keyframe checks run per sub-frame.
        A loss anywhere in the pair rolls back to the pre-pair state (losses
        are rare in VI steady state; the one extra dropped frame is cheaper
        than per-frame backups)."""
        cfg = self.cfg
        name = ("harvest_pull" if self._summary_ready(p)
                else "harvest_pull_block")
        with self.timers.stage(name):
            s2 = np.asarray(p["summary"])
        for i, fr in enumerate(p["frames"]):
            n_in = int(s2[i][0])
            if n_in < max(6, cfg.min_track_inliers // 2):
                self._rollback_pending(p)
                self._prev_match = None
                self.state = LOST
                self.n_lost_frames += len(p["frames"]) - i
                self.events.append((fr["frame_id"], "lost",
                                    dict(mode="vi2", n_in=n_in)))
                return
            self._cur_inliers = n_in
            if (not self.localization_only
                    and p.get("epoch") == self._map_epoch
                    and self._need_new_kf(fid=fr["frame_id"])):
                with self.timers.stage("local_mapping"):
                    with self.timers.stage("lm_insert"):
                        slot = self._create_keyframe(
                            fr["feats"], fr["uv"], fr["t"],
                            fid=fr["frame_id"], pose=fr["pose"],
                            ns=fr["ns"], feat_mp=fr["feat_mp"])
                    self._local_mapping()
                self._invalidate_frame_caches()

    def _harvest_event(self, force=False):
        """Harvest the deferred tail of the last keyframe event: post-BA
        redundancy stats (keyframe culling + the NeedNewKeyFrame reference
        count) and loop detection results (+ any closure). READINESS-GATED:
        consumed only once the async copies have landed (the event's device
        programs take ~hundreds of ms and tracking keeps dispatching against
        the in-flight map state meanwhile — the TPU-native analog of the
        reference's LocalMapping/LoopClosing threads running behind Tracking,
        src/System.cpp:196-203). force=True blocks (flush, next event)."""
        ev = self._deferred_event
        if ev is None:
            return
        if not force:
            ev["age"] = ev.get("age", 0) + 1
            try:
                leaves = jax.tree_util.tree_leaves((ev["stats"], ev["detect"]))
                if not all(h.is_ready() for h in leaves):
                    return
            except Exception:
                # backend without is_ready: age-gate instead (consume a few
                # frames after dispatch, when the copies have likely landed,
                # rather than blocking the frame loop on the whole event chain)
                if ev["age"] < 4:
                    return
        self._deferred_event = None
        slot = ev["slot"]
        if "t_disp" in ev:
            # drain time of the whole keyframe-event device chain (dispatch
            # of the event's last program -> its stats copy landing): the
            # frame loop must absorb this much in-flight latency
            import time as _t
            self.timers.samples["ev_chain_drain"].append(
                _t.perf_counter() - ev["t_disp"])
        with self.timers.stage("lm_stats2"):
            covis2, red2, npts2, _, well2 = jax.device_get(ev["stats"])
        if slot in self.kf_slots:
            self._covis_row_cache = (slot, covis2)
            self._ref_tracked_cache = int(well2)
            with self.timers.stage("lm_cullkf"):
                self._cull_keyframes(red2, npts2)
        if ev["detect"] is not None and slot in self.kf_slots:
            with self.timers.stage("loop_closing"):
                self._try_close_loop(slot, handles=ev["detect"])
                if self.n_loops_closed and self._last_loop_nkf == self.n_kf:
                    self._invalidate_frame_caches()

    def flush(self):
        """Complete any in-flight frame and flush device trajectory rows.
        Call before reading system state externally."""
        self._harvest_pending(drain=True)
        self._harvest_event(force=True)
        self._harvest_sim3(force=True)
        while self._deferred_verify is not None:
            self._harvest_verify(force=True)
        self.traj.flush()

    # ------------------------------------------------------------------
    # Depth modes: RGB-D and stereo (System.h:45-50 sensor enum; stereo
    # matching replaces Frame's L/R threads; StereoInitialization creates the
    # map from the first frame instead of 2-view RANSAC)
    # ------------------------------------------------------------------
    def _feature_depth(self, feats, uv, depth, img_right):
        """Per-feature metric depth from an RGB-D map or a rectified right
        image; None in monocular mode."""
        if depth is not None:
            dm = np.asarray(depth, np.float32)
            xy = np.asarray(feats.xy)
            xs = np.clip(xy[:, 0].astype(int), 0, dm.shape[1] - 1)
            ys = np.clip(xy[:, 1].astype(int), 0, dm.shape[0] - 1)
            d = dm[ys, xs]
            return jnp.asarray(np.where(d > 1e-3, d, -1.0))
        if img_right is not None:
            from mc_slam_tpu.frontend import stereo
            fR = extractor.extract(jnp.asarray(img_right, jnp.float32),
                                   n_features=self.cfg.n_feat,
                                   n_levels=self.cfg.n_levels)
            uvR = self._undistort(fR)
            d, ok = stereo.stereo_depth(uv, feats.desc_pm1, feats.valid,
                                        uvR, fR.desc_pm1, fR.valid,
                                        float(self.cam.fx), self.cfg.stereo_baseline)
            # only "close" points are trustworthy stereo depth (the reference's
            # mThDepth = 35 * baseline rule); farther landmarks come from
            # multi-view triangulation instead
            return jnp.where(d < 35.0 * self.cfg.stereo_baseline, d, -1.0)
        return None

    def _depth_to_world(self, uv, feat_depth, P_b, R_b):
        """Ideal pixel + depth -> world points under body pose (P_b, R_b)."""
        xn = (uv - jnp.asarray([float(self.cam.cx), float(self.cam.cy)])) / \
            jnp.asarray([float(self.cam.fx), float(self.cam.fy)])
        Xc = jnp.concatenate([xn * feat_depth[:, None], feat_depth[:, None]], axis=1)
        Rbc = jnp.swapaxes(self.ext.Rcb, -1, -2)
        pbc = -(Rbc @ self.ext.tcb[..., None])[..., 0]
        Xb = (Rbc @ Xc[..., None])[..., 0] + pbc
        return (R_b @ Xb[..., None])[..., 0] + P_b

    def _alloc_points(self, Xw, desc, pm1, level, ref_slot, order_sel,
                      angle=None):
        """Write new landmarks into free map slots. order_sel: bool (F,) mask in
        feature order; returns the chosen slots (np array aligned to features)."""
        m = self.m
        free_slots = np.nonzero(~np.asarray(m.mp_active))[0]
        feat_idx = np.nonzero(order_sel)[0]
        k = min(len(free_slots), len(feat_idx))
        feat_idx = feat_idx[:k]
        slots = free_slots[:k]
        if k == 0:
            return np.zeros(0, int), np.zeros(0, int)
        Xs = np.asarray(Xw)[feat_idx]
        dist = np.linalg.norm(Xs - np.asarray(self.m.kf_ns.P[ref_slot]), axis=1)
        lvl = np.asarray(level)[feat_idx].astype(np.float32)
        max_d = dist * (1.2 ** lvl)
        min_d = np.asarray(mapping.band_min_dist(max_d, self.cfg.n_levels))
        sl = jnp.asarray(slots)
        self.m = m._replace(
            mp_pos=m.mp_pos.at[sl].set(jnp.asarray(Xs)),
            mp_desc=m.mp_desc.at[sl].set(desc[jnp.asarray(feat_idx)]),
            mp_pm1=m.mp_pm1.at[sl].set(pm1[jnp.asarray(feat_idx)]),
            mp_normal=m.mp_normal.at[sl].set(
                jnp.asarray(Xs / np.maximum(dist, 1e-9)[:, None])),
            mp_min_dist=m.mp_min_dist.at[sl].set(jnp.asarray(min_d)),
            mp_max_dist=m.mp_max_dist.at[sl].set(jnp.asarray(max_d)),
            mp_ref_kf=m.mp_ref_kf.at[sl].set(ref_slot),
            mp_angle=(m.mp_angle.at[sl].set(angle[jnp.asarray(feat_idx)])
                      if angle is not None else m.mp_angle),
            mp_first_kf=m.mp_first_kf.at[sl].set(self.frame_id),
            mp_found=m.mp_found.at[sl].set(1.0),
            mp_visible=m.mp_visible.at[sl].set(1.0),
            mp_active=m.mp_active.at[sl].set(True),
            kf_mp=m.kf_mp.at[ref_slot, jnp.asarray(feat_idx)].set(sl),
        )
        return feat_idx, slots

    def _initialize_from_depth(self, feats, uv, feat_depth, t):
        """Stereo/RGB-D initialization: one keyframe, metric points from depth
        (Tracking::StereoInitialization)."""
        good = np.asarray(feats.valid) & (np.asarray(feat_depth) > 1e-3)
        if good.sum() < 50:
            return False
        slot = self._insert_kf_raw(jnp.zeros(3), jnp.eye(3), feats, uv, t_kf=t)
        Xw = self._depth_to_world(uv, feat_depth, jnp.zeros(3), jnp.eye(3))
        self._alloc_points(Xw, feats.desc, feats.desc_pm1, feats.level, slot,
                           good, angle=feats.angle)
        self.last_pose = (jnp.zeros(3), jnp.eye(3))
        self.velocity = (jnp.zeros(3), jnp.eye(3))
        self.state = OK
        self._cur_feat_mp = jnp.asarray(np.asarray(self.m.kf_mp[slot]))
        self._cur_inliers = int(good.sum())
        return True

    def _add_depth_points(self, slot, feats, uv, feat_depth, max_new=128):
        """On keyframe creation, add landmarks for unassociated features with
        depth (Tracking::CreateNewKeyFrame's close-point insertion for
        stereo/RGB-D)."""
        has_mp = np.asarray(self.m.kf_mp[slot]) >= 0
        d_np = np.asarray(feat_depth)
        cand = np.asarray(feats.valid) & (d_np > 1e-3) & ~has_mp
        if cand.sum() == 0:
            return
        # nearest-first, capped
        order = np.argsort(np.where(cand, d_np, np.inf))[:max_new]
        sel = np.zeros_like(cand)
        sel[order[np.isfinite(np.where(cand, d_np, np.inf)[order])]] = True
        P_b, R_b = self._kf_body_pose(slot)
        Xw = self._depth_to_world(uv, feat_depth, P_b, R_b)
        self._alloc_points(Xw, feats.desc, feats.desc_pm1, feats.level, slot, sel,
                           angle=feats.angle)

    # ------------------------------------------------------------------
    # Monocular initialization (Tracking::MonocularInitialization :1322)
    # ------------------------------------------------------------------
    def _try_initialize(self, feats, uv, t):
        cfg = self.cfg
        f0, uv0 = self.init_feats, self.init_uv
        idx, best, ok = matching.search_for_initialization(
            uv0, f0.desc_pm1, f0.valid, uv, feats.desc_pm1, feats.valid,
            radius=100.0, ratio=0.9, f0_angle=f0.angle, f1_angle=feats.angle)
        n = int(jnp.sum(ok))
        if n < cfg.min_init_matches:
            # too few matches: make this the new reference (reference resets too)
            self.init_feats, self.init_uv = feats, uv
            return False
        focal = float(self.cam.fx)
        xn0 = (uv0 - jnp.asarray([self.cam.cx, self.cam.cy])) / jnp.asarray(
            [self.cam.fx, self.cam.fy])
        xn1_all = (uv - jnp.asarray([self.cam.cx, self.cam.cy])) / jnp.asarray(
            [self.cam.fx, self.cam.fy])
        xn1 = xn1_all[idx]
        self.key, sub = jax.random.split(self.key)
        res = init2view.initialize_two_view(sub, xn0, xn1,
                                            ok.astype(jnp.float32), focal)
        if not bool(res.ok):
            return False
        # scale: median depth of good points -> 1 (CreateInitialMapMonocular)
        good = np.asarray(res.good)
        Xw = np.asarray(res.Xw)
        med = float(np.median(Xw[good][:, 2])) if good.sum() else 1.0
        if med <= 1e-6:
            return False
        scale = 1.0 / med
        Xw = Xw * scale
        C1 = np.asarray(res.t) * scale

        # KF0 at camera origin, KF1 at (R,C1) — body == camera during visual init;
        # we store body poses assuming ext maps body->cam (apply inverse ext)
        self._insert_kf_raw(jnp.zeros(3), jnp.eye(3), f0, uv0, t_kf=self.last_time,
                            cam_frame=True)
        slot1 = self._insert_kf_raw(jnp.asarray(C1), jnp.asarray(res.R), feats, uv,
                                    t_kf=t, cam_frame=True)
        # allocate map points and associations
        good_idx = np.nonzero(good)[0]
        m = self.m
        slots = np.arange(len(good_idx), dtype=np.int32)
        mp_pos = m.mp_pos.at[slots].set(jnp.asarray(Xw[good_idx]))
        desc = f0.desc[good_idx]
        pm1 = f0.desc_pm1[good_idx]
        cwa = np.zeros(3, np.float32)
        dist_a = np.linalg.norm(Xw[good_idx] - cwa, axis=1).astype(np.float32)
        lvl = np.asarray(f0.level)[good_idx].astype(np.float32)
        max_d = dist_a * (1.2 ** lvl)
        min_d = np.asarray(mapping.band_min_dist(max_d, self.cfg.n_levels))
        m = m._replace(
            mp_pos=mp_pos,
            mp_desc=m.mp_desc.at[slots].set(desc),
            mp_pm1=m.mp_pm1.at[slots].set(pm1),
            mp_normal=m.mp_normal.at[slots].set(
                jnp.asarray(Xw[good_idx] / np.maximum(dist_a, 1e-9)[:, None])),
            mp_min_dist=m.mp_min_dist.at[slots].set(jnp.asarray(min_d)),
            mp_max_dist=m.mp_max_dist.at[slots].set(jnp.asarray(max_d)),
            mp_ref_kf=m.mp_ref_kf.at[slots].set(0),
            mp_angle=m.mp_angle.at[slots].set(f0.angle[good_idx]),
            mp_first_kf=m.mp_first_kf.at[slots].set(0),
            mp_found=m.mp_found.at[slots].set(2.0),
            mp_visible=m.mp_visible.at[slots].set(2.0),
            mp_active=m.mp_active.at[slots].set(True),
            kf_mp=m.kf_mp
                .at[0, jnp.asarray(good_idx)].set(jnp.asarray(slots))
                .at[slot1, jnp.asarray(np.asarray(idx)[good_idx])].set(jnp.asarray(slots)),
        )
        self.m = m
        # initial visual BA over the two views (GlobalBundleAdjustment(20))
        self._local_ba(force_all=True)
        self.last_pose = self._kf_body_pose(slot1)
        self.velocity = (jnp.zeros(3), jnp.eye(3))
        self.state = OK
        return True

    def _kf_body_pose(self, slot):
        return self.m.kf_ns.P[slot], self.m.kf_ns.R[slot]

    def _cam_to_body(self, P_c, R_c):
        """Camera pose (world-from-camera) -> body pose via extrinsics."""
        Rbc = jnp.swapaxes(self.ext.Rcb, -1, -2)
        pbc = -(Rbc @ self.ext.tcb[..., None])[..., 0]
        R_b = R_c @ jnp.swapaxes(Rbc, -1, -2)
        P_b = P_c - (R_b @ pbc[..., None])[..., 0]
        return P_b, R_b

    def _alloc_kf_slot(self):
        """Slot allocation with recycling (VERDICT round-1 item 9): culled
        slots are reused; at hard capacity the most redundant old active KF is
        evicted (the reference's map is unbounded, src/KeyFrame.cpp; a fixed
        padded table needs an eviction policy instead of an assert)."""
        if self.free_slots:
            return self.free_slots.pop(0)
        if self.next_fresh_slot < self.cfg.max_kf:
            slot = self.next_fresh_slot
            self.next_fresh_slot += 1
            return slot
        # capacity exhausted: evict — prefer the most redundant old KF,
        # protecting KF0 (gauge), the recent local window, and loop-edge
        # carriers (KeyFrame::SetNotErase for loop KFs)
        prot = set(self.kf_slots[-max(2, self.cfg.local_window):]) | {self.kf_slots[0]}
        for e in self.loop_edges:
            prot.add(e[0]); prot.add(e[1])
        cand = [s2 for s2 in self.kf_slots if s2 not in prot]
        if not cand:
            cand = [self.kf_slots[1]]
        red = []
        for s2 in cand[:16]:
            ratio, n_pts = mapping.kf_redundancy(self.m, jnp.asarray(s2))
            red.append((float(ratio), s2))
        victim = max(red)[1]
        self._remove_keyframe(victim)
        return self.free_slots.pop(0)

    def _remove_keyframe(self, s2):
        """Deactivate a KF and recycle its slot (SetBadFlag bookkeeping)."""
        self._splice_imu_chain(s2)
        # re-anchor map points referencing the removed KF to its successor
        act = self.kf_slots
        i = act.index(s2)
        heir = act[i + 1] if i + 1 < len(act) else act[i - 1]
        # reparent trajectory entries referencing this KF onto the heir
        # (KeyFrame::SetBadFlag parenting: saved frame poses compose through
        # the surviving parent, src/KeyFrame.cpp:195-252) — otherwise those
        # frames fall back to their track-time absolute pose and miss every
        # later correction (VI-init rescale, loop closures, GBA)
        kid = self.kf_id_host[s2]
        heir_id = self.kf_id_host[heir]
        Pk = np.asarray(self.m.kf_ns.P[s2])
        Rk = np.asarray(self.m.kf_ns.R[s2])
        Ph = np.asarray(self.m.kf_ns.P[heir])
        Rh = np.asarray(self.m.kf_ns.R[heir])
        R_hk = Rh.T @ Rk                     # culled KF in heir frame
        P_hk = Rh.T @ (Pk - Ph)
        self.traj.reparent(s2, kid, heir, heir_id, P_hk, R_hk)
        ref = self.m.mp_ref_kf
        self.m = self.m._replace(
            mp_ref_kf=jnp.where(ref == s2, heir, ref))
        self.m = mapping.deactivate_keyframe(self.m, jnp.asarray(s2))
        self.kf_slots.remove(s2)
        self.loop_edges = [e for e in self.loop_edges
                           if e[0] != s2 and e[1] != s2]
        self.kf_imu_raw.pop(s2, None)
        self.kf_time_host.pop(s2, None)
        self.kf_id_host.pop(s2, None)
        self.broken_chain_slots.discard(s2)
        self.free_slots.append(s2)

    def _insert_kf_raw(self, P_pose, R_pose, feats, uv, t_kf, cam_frame=False,
                       fid=None, ns=None):
        """Write a keyframe into a free slot. Returns slot index."""
        fid = self.frame_id if fid is None else fid
        src_ns = ns if ns is not None else self.last_ns
        if cam_frame:
            P_pose, R_pose = self._cam_to_body(P_pose, R_pose)
        slot = self._alloc_kf_slot()
        m = self.m
        ns = m.kf_ns
        take = [r for f, r in self.imu_since_kf if f <= fid]
        if self.cfg.use_imu and take:
            raw = np.concatenate(take, 0)
            self.kf_imu_raw[slot] = raw
            # device handles, no pull: bias of the state carried into this KF
            bg = (src_ns.bg_full if self.vi_inited
                  else jnp.zeros(3, jnp.float32))
            ba_ = (src_ns.ba_full if self.vi_inited
                   else jnp.zeros(3, jnp.float32))
            pre = self._preintegrate_raw(raw, bg, ba_)
            m = m._replace(kf_preint=jax.tree_util.tree_map(
                lambda a, b: a.at[slot].set(b), m.kf_preint, pre))
            self.imu_since_kf = [(f, r) for f, r in self.imu_since_kf
                                 if f > fid]
        # fold delta-bias into the base bias at KF creation
        # (Frame::SetInitialNavStateAndBias, src/Frame.cpp:111-118)
        ns = ns._replace(
            P=ns.P.at[slot].set(P_pose), R=ns.R.at[slot].set(R_pose),
            V=ns.V.at[slot].set(src_ns.V),
            bg=ns.bg.at[slot].set(src_ns.bg_full),
            ba=ns.ba.at[slot].set(src_ns.ba_full),
            dbg=ns.dbg.at[slot].set(0.0), dba=ns.dba.at[slot].set(0.0))
        self.m = m._replace(
            kf_ns=ns,
            kf_time=m.kf_time.at[slot].set(t_kf),
            kf_id=m.kf_id.at[slot].set(fid),
            kf_active=m.kf_active.at[slot].set(True),
            kf_uv=m.kf_uv.at[slot].set(uv),
            kf_level=m.kf_level.at[slot].set(feats.level),
            kf_angle=m.kf_angle.at[slot].set(feats.angle),
            kf_ur=m.kf_ur.at[slot].set(
                self._cur_ur if getattr(self, "_cur_ur", None) is not None
                else jnp.full(self.m.F, -1.0)),
            kf_desc=m.kf_desc.at[slot].set(feats.desc),
            kf_pm1=m.kf_pm1.at[slot].set(feats.desc_pm1),
            kf_feat_valid=m.kf_feat_valid.at[slot].set(feats.valid),
        )
        self.n_kf += 1
        self.kf_time_host[slot] = float(t_kf)
        self.kf_id_host[slot] = int(fid)
        if self._chain_break_pending:
            self.broken_chain_slots.add(slot)
            self._chain_break_pending = False
        self.kf_slots.append(slot)
        self.last_kf_slot = slot
        self.last_kf_frame = fid
        if self.first_kf_time is None:
            self.first_kf_time = t_kf
        self.loop.add_keyframe(slot, feats.desc_pm1,
                               feats.valid.astype(jnp.float32), kf_id=fid)
        return slot

    # ------------------------------------------------------------------
    # Per-frame tracking
    # ------------------------------------------------------------------
    def _track_frame(self, feats, uv, t):
        if self.vi_inited and self.reloc_buf is not None:
            return self._track_frame_reloc_window(feats, uv, t)
        if self.vi_inited:
            return self._track_frame_vi(feats, uv, t)
        # pre-VI-init, per-frame IMU windows are unused (re-seeded at init time)
        self.imu_since_frame = []
        cfg = self.cfg
        P_last, R_last = self.last_pose
        dP, dR = self.velocity
        pfm, pang = self._prev_match if self._prev_match is not None else (None, None)
        res, vel, mp_found, mp_vis = tracking.track_frame_visual_step(
            self.m, feats, uv, self.cam, self.ext, P_last, R_last, dP, dR,
            feat_ur=self._cur_ur, bf=self._bf, rtol=cfg.track_rtol,
            prev_feat_mp=pfm, prev_angle=pang)
        n_in = int(res.n_inliers)
        if n_in < cfg.min_track_inliers:
            # fallback: retry from last pose with a wide window
            res = tracking.track_frame_visual(self.m, feats, uv, self.cam,
                                              self.ext, P_last, R_last,
                                              radius_coarse=40.0,
                                              feat_ur=self._cur_ur, bf=self._bf)
            n_in = int(res.n_inliers)
            if n_in < cfg.min_track_inliers:
                # motion-prior-free fallback against the reference keyframe
                # (TrackReferenceKeyFrame, src/Tracking.cpp:1524)
                res2 = self._track_reference_kf(feats, uv)
                if res2 is None:
                    self.state = LOST
                    self._prev_match = None
                    return False
                res, n_in = res2, int(res2.n_inliers)
            # velocity model + counters for the fallback result
            RlT = jnp.swapaxes(R_last, -1, -2)
            vel = ((RlT @ (res.P - P_last)[..., None])[..., 0], RlT @ res.R)
            mp_found = mp_vis = None
        self.velocity = vel                  # (src/Tracking.cpp:1123-1134)
        self.last_pose = (res.P, res.R)
        self._cur_feat_mp = res.feat_mp
        self._prev_match = (res.feat_mp, feats.angle)
        self._cur_inliers = n_in
        if mp_found is None:
            vis_mask = jnp.zeros(self.m.P, bool).at[
                jnp.clip(res.feat_mp, 0, self.m.P - 1)].set(
                    res.feat_mp >= 0, mode="drop")
            self.m = mapping.update_found_visible(self.m, vis_mask, vis_mask)
        else:
            self.m = self.m._replace(mp_found=mp_found, mp_visible=mp_vis)
        self.state = OK
        return True

    @staticmethod
    def _imu_rows(buf):
        """Concatenate (frame_id, rows) blocks into one (T,7) array."""
        if not buf:
            return np.zeros((0, 7), np.float32)
        return np.concatenate([r for _, r in buf], 0)

    def _preintegrate_raw(self, raw, bg, ba):
        """Chunked preintegration of an arbitrary-length host IMU buffer:
        chains fixed-size scans through `init`, lifting the fixed-row
        truncation that silently shortened long keyframe gaps (culling can
        legally open gaps up to 3 s, src/KeyFrame.cpp:195-252 ComputePreInt
        over the full spliced span). A truncated preintegration makes the PRV
        residual inconsistent with the state delta and the optimizer dumps the
        mismatch into the biases."""
        L = self.cfg.max_imu_per_kf
        pre = None
        n = len(raw)
        for s in range(0, max(n, 1), L):
            chunk = raw[s:s + L]
            rawp = np.zeros((L, 7), np.float32)
            rawp[:len(chunk)] = chunk
            pre = preintegrate(jnp.asarray(rawp), bg, ba, self.noise, init=pre)
        return pre

    @staticmethod
    def _fresh_prior_info(pose_info):
        """15x15 prior information for a freshly (re)seated frame state,
        order [P, phi, V, dbg, dba].

        Pose/velocity get `pose_info` (weak: the next visual solve should
        dominate), but BIASES get window-BA-level confidence (sigma_bg ~1e-3,
        sigma_ba ~1e-2): the re-seated state's biases come from the keyframe
        chain, which is RW-anchored all the way back to VI init. An isotropic
        weak prior here (the old identity*1e3, sigma_bias ~0.03) let the
        per-frame estimator re-derive biases from ~1 s of data between
        keyframes — noise-dominated, so the frame bias wandered +-0.03,
        every new keyframe injected that wander into the chain (observed as
        a ~5e6 bias-RW edge cost on each newest keyframe), and the window BA
        could only partially smooth it back (the wander is RW-plausible per
        edge), accumulating into 0.05+ accel-bias error and the post-init
        sawtooth. The reference never weakens its bias prior: mMargCovInv
        chains the full marginal frame to frame (src/Optimizer.cpp:1997-2014)
        and map updates re-anchor the frame's bias to the KEYFRAME state
        (PoseOptimization(F, LastKF), src/Tracking.cpp:338-412)."""
        d = np.full(15, float(pose_info), np.float32)
        d[9:12] = 1e6    # gyro bias: sigma ~1e-3 rad/s
        d[12:15] = 1e4   # accel bias: sigma ~1e-2 m/s^2
        return np.diag(d)

    def _track_frame_vi(self, feats, uv, t):
        """IMU-predicted tracking with the marginal prior
        (Tracking::TrackWithIMU + TrackLocalMapWithIMU)."""
        cfg = self.cfg
        rows = self._imu_rows(self.imu_since_frame)
        rows = rows[-cfg.max_imu_per_kf:]
        rawp = np.zeros((cfg.max_imu_per_kf, 7), np.float32)
        rawp[:len(rows)] = rows
        if self.prior is None:
            self.prior = ba_vi.PriorFactor(
                cam=jnp.asarray(0, jnp.int32), ns0=self.last_ns,
                info=jnp.asarray(self._fresh_prior_info(1e3), jnp.float32),
                valid=jnp.asarray(1.0, jnp.float32))
        # fused step: track + bias-jump sanity + prior symmetrization +
        # found/visible counters all on device; ONE small host pull per frame
        ns2, feat_mp, H_prior, mp_found, mp_vis, summary = \
            tracking.track_frame_vi_step(
                self.m, feats, uv, self.cam, self.ext, jnp.asarray(rawp),
                self.noise, self.last_ns, self.gw, self.prior,
                sigma_bg=float(self.noise.sigma_bg),
                sigma_ba=float(self.noise.sigma_ba),
                feat_ur=self._cur_ur, bf=self._bf, rtol=cfg.track_rtol,
                prev_feat_mp=(self._prev_match[0] if self._prev_match is not None else None),
                prev_angle=(self._prev_match[1] if self._prev_match is not None else None))
        summary = np.asarray(summary)
        n_in = int(summary[0])
        # sanity gate on the per-frame bias step: the bias random walk allows
        # ~1e-3 between frames; a jump orders of magnitude beyond that means
        # the joint solve went numerically bad (f32 PRV information can come
        # out indefinite on degenerate windows) — one poisoned NavState kills
        # IMU prediction for every following frame
        bias_jump = bool(summary[1])
        if n_in < 20 or bias_jump:
            # IMU prediction missed the match window (bad gravity/bias or fast
            # motion): fall back to wide-window visual tracking from the last
            # pose, as the reference widens th and drops to
            # TrackReferenceKeyFrame (src/Tracking.cpp:358-365, :876-884)
            resv = tracking.track_frame_visual(
                self.m, feats, uv, self.cam, self.ext,
                self.last_ns.P, self.last_ns.R, radius_coarse=40.0)
            if int(resv.n_inliers) > n_in or bias_jump:
                dt_f = max(t - self.last_time, 1e-3)
                V_est = (resv.P - self.last_ns.P) / dt_f
                ns2 = self.last_ns._replace(P=resv.P, R=resv.R, V=V_est)
                feat_mp = resv.feat_mp
                n_in = int(resv.n_inliers)
                # weak fresh prior on pose/velocity; biases keep their anchor
                H_prior = jnp.asarray(self._fresh_prior_info(1e2), jnp.float32)
                mp_found = mp_vis = None       # recompute for the new feat_mp
        # accept threshold: >= 6 inliers with IMU support (src/Tracking.cpp:281-288)
        if n_in < max(6, cfg.min_track_inliers // 2):
            self.state = LOST
            self._prev_match = None
            return False
        self.last_ns = ns2
        self.last_pose = (ns2.P, ns2.R)
        # next frame's prior: this frame's marginal information (+ floor)
        self.prior = ba_vi.PriorFactor(
            cam=self._c0i, ns0=ns2, info=H_prior, valid=self._c1f)
        self.imu_since_frame = []
        self._cur_feat_mp = feat_mp
        self._prev_match = (feat_mp, feats.angle)
        self._cur_inliers = n_in
        if mp_found is None:
            vis_mask = jnp.zeros(self.m.P, bool).at[
                jnp.clip(feat_mp, 0, self.m.P - 1)].set(feat_mp >= 0, mode="drop")
            self.m = mapping.update_found_visible(self.m, vis_mask, vis_mask)
        else:
            self.m = self.m._replace(mp_found=mp_found, mp_visible=mp_vis)
        self.state = OK
        return True

    def _track_frame_reloc_window(self, feats, uv, t):
        """Visual tracking while the post-reloc bias window fills (the
        reference tracks without IMU while mbRelocBiasPrepare is set)."""
        cfg = self.cfg
        rows = self._imu_rows(self.imu_since_frame)
        self.imu_since_frame = []
        P_last, R_last = self.last_pose
        dP, dR = self.velocity
        P0 = P_last + (R_last @ dP[..., None])[..., 0]
        R0 = R_last @ dR
        res = tracking.track_frame_visual(self.m, feats, uv, self.cam, self.ext,
                                          P0, R0, feat_ur=self._cur_ur,
                                          bf=self._bf)
        n_in = int(res.n_inliers)
        if n_in < cfg.min_track_inliers:
            res = tracking.track_frame_visual(self.m, feats, uv, self.cam,
                                              self.ext, P_last, R_last,
                                              radius_coarse=40.0,
                                              feat_ur=self._cur_ur, bf=self._bf)
            n_in = int(res.n_inliers)
            if n_in < cfg.min_track_inliers:
                self.state = LOST
                self.reloc_buf = None      # window aborted; re-relocalize
                self._prev_match = None
                return False
        RlT = jnp.swapaxes(R_last, -1, -2)
        self.velocity = ((RlT @ (res.P - P_last)[..., None])[..., 0], RlT @ res.R)
        self.last_pose = (res.P, res.R)
        self._cur_feat_mp = res.feat_mp
        self._cur_inliers = n_in
        self.state = OK
        self.reloc_buf.append(dict(
            t=t, P=np.asarray(res.P), R=np.asarray(res.R),
            feat_mp=np.asarray(res.feat_mp),
            uv=np.asarray(uv), level=np.asarray(feats.level),
            valid=np.asarray(feats.valid), imu=rows))
        if len(self.reloc_buf) >= self.reloc_window:
            self._recompute_bias_from_window()
            self.reloc_buf = None
            self._invalidate_frame_caches()
        return True

    def _recompute_bias_from_window(self):
        """Re-solve biases + NavState over the buffered post-reloc frames
        (Tracking::RecomputeIMUBiasAndCurrentNavstate, src/Tracking.cpp:47-220)
        as multi-frame fixed-point VI optimization: every frame pose is free,
        chained by IMU PRV + bias-RW edges against the (fixed) map."""
        buf = self.reloc_buf
        N = len(buf)
        cfg = self.cfg
        L = cfg.max_imu_per_kf
        bg0 = self.last_ns.bg_full
        ba0 = self.last_ns.ba_full
        # preintegrate each inter-frame IMU batch at the stale bias
        raw = np.zeros((N - 1, L, 7), np.float32)
        for i in range(1, N):
            r = buf[i]["imu"][-L:]
            raw[i - 1, :len(r)] = r
        pre = jax.vmap(lambda rr: preintegrate(rr, bg0, ba0, self.noise))(
            jnp.asarray(raw))
        # initial NavStates from the visual poses; V by forward differences
        P = np.stack([b["P"] for b in buf])
        R = np.stack([b["R"] for b in buf])
        ts = np.asarray([b["t"] for b in buf])
        V = np.zeros_like(P)
        V[:-1] = (P[1:] - P[:-1]) / np.maximum(
            (ts[1:] - ts[:-1])[:, None], 1e-3)
        V[-1] = V[-2]
        z3 = np.zeros((N, 3), np.float32)
        ns0 = NavState(P=jnp.asarray(P), R=jnp.asarray(R), V=jnp.asarray(V),
                       bg=jnp.broadcast_to(bg0, (N, 3)),
                       ba=jnp.broadcast_to(ba0, (N, 3)),
                       dbg=jnp.asarray(z3), dba=jnp.asarray(z3))
        edges = ba_vi.IMUEdges(
            i=jnp.arange(0, N - 1, dtype=jnp.int32),
            j=jnp.arange(1, N, dtype=jnp.int32),
            pre=pre, info_prv=factors.imu_prv_info(pre),
            info_bias=factors.bias_rw_info(pre.dT, float(self.noise.sigma_bg),
                                           float(self.noise.sigma_ba)),
            valid=jnp.ones(N - 1, jnp.float32))
        Fn = self.m.F
        mp = np.stack([b["feat_mp"] for b in buf]).reshape(-1)
        lvl = np.stack([b["level"] for b in buf]).reshape(-1)
        fv = np.stack([b["valid"] for b in buf]).reshape(-1)
        obs = VisualObs(
            cam=jnp.repeat(jnp.arange(N, dtype=jnp.int32), Fn),
            pt=jnp.asarray(np.clip(mp, 0, self.m.P - 1), jnp.int32),
            uv=jnp.asarray(np.stack([b["uv"] for b in buf]).reshape(-1, 2),
                           jnp.float32),
            inv_sigma2=jnp.asarray(
                1.0 / (1.2 ** (2.0 * lvl.astype(np.float32))), jnp.float32),
            valid=jnp.asarray(((mp >= 0) & fv).astype(np.float32)))
        free = jnp.ones(N, jnp.float32)
        # single phase: the reference's bias recompute is one closed-form
        # solve over the whole window with no outlier rounds
        # (src/Tracking.cpp:47-220); an early re-classification on 4-iteration
        # residuals prunes informative observations and degrades the recovery
        ns2, _, chi2, cost = ba_vi.vi_ba(
            ns0, self.m.mp_pos, obs, edges, self.cam, self.ext, self.gw,
            free, self.m.mp_active.astype(jnp.float32), prior=None,
            iters=10, fix_points=True, two_phase=False)
        nsl = jax.tree_util.tree_map(lambda a: a[-1], ns2)
        if bool(jnp.all(jnp.isfinite(nsl.P)) & jnp.all(jnp.isfinite(nsl.V))):
            self.last_ns = nsl
            self.last_pose = (nsl.P, nsl.R)
            self.prior = None

    def _invalidate_frame_caches(self):
        """Drop per-frame caches after any KF-rate map mutation (new KF, BA,
        culling, loop correction, VI init, relocalization)."""
        self._ref_tracked_cache = None
        self._anchor_cache = None
        self._covis_row_cache = None
        self._map_epoch = getattr(self, "_map_epoch", 0) + 1

    def _need_new_kf(self, fid=None):
        cfg = self.cfg
        fid = self.frame_id if fid is None else fid
        if self.reloc_buf is not None:
            return False
        since = fid - self.last_kf_frame
        if since < cfg.kf_min_gap:
            return False
        if since >= cfg.kf_max_gap:
            return True
        # ratio of current inliers vs reference-KF WELL-OBSERVED points
        # (TrackedMapPoints(nMinObs=3), src/Tracking.cpp:1893 — counting every
        # association makes the ratio rule fire per-frame and flood the map).
        # The count only changes at KF-rate map mutations — cached between
        # keyframes (tracking never edits keyframe observation rows)
        if getattr(self, "_ref_tracked_cache", None) is None:
            mp_ref = self.m.kf_mp[self.last_kf_slot]
            obs_n = observation_counts(self.m)
            min_obs = 2 if len(self.kf_slots) <= 2 else 3
            well = ((mp_ref >= 0)
                    & (obs_n[jnp.clip(mp_ref, 0, self.m.P - 1)] >= min_obs))
            self._ref_tracked_cache = int(jnp.sum(well))
        ref_tracked = self._ref_tracked_cache
        return (self._cur_inliers < cfg.kf_ref_ratio * max(ref_tracked, 1)
                and self._cur_inliers > 15)

    def _create_keyframe(self, feats, uv, t, fid=None, pose=None, ns=None,
                         feat_mp=None):
        P, R = pose if pose is not None else self.last_pose
        slot = self._insert_kf_raw(P, R, feats, uv, t_kf=t, fid=fid, ns=ns)
        # carry THIS FRAME's tracked associations into the KF (with in-flight
        # frames, self._cur_feat_mp belongs to the newest dispatch, whose
        # feature table is a different frame's)
        fm = feat_mp if feat_mp is not None else self._cur_feat_mp
        self.m = self.m._replace(kf_mp=self.m.kf_mp.at[slot].set(fm))
        return slot

    # ------------------------------------------------------------------
    # Local mapping (synchronous, per new KF)
    # ------------------------------------------------------------------
    def _covis_row(self, slot):
        """Host copy of the covisibility weights row for `slot`, served from
        the per-KF-event stats pull when fresh (one round trip serves every
        neighbor query of the event)."""
        cache = getattr(self, "_covis_row_cache", None)
        if cache is not None and cache[0] == slot:
            return cache[1].copy()
        return np.array(covisibility_weights(self.m, slot))

    def _covisible(self, slot, n):
        """Top-n covisible keyframes with weight >= covis_th (the reference's
        UpdateConnections threshold 15, src/KeyFrame.cpp:668; falls back to the
        single best neighbor when nothing clears the bar, as the reference
        keeps the max-weight edge regardless)."""
        w = self._covis_row(slot)
        w[slot] = 0
        w = w * self._active_mask()
        order = np.argsort(-w)
        out = [int(k) for k in order[:n] if w[k] >= self.cfg.covis_th]
        if not out and w[order[0]] > 0:
            # nothing clears the bar: keep the single max-weight edge, as the
            # reference does in UpdateConnections (src/KeyFrame.cpp:690-696)
            out = [int(order[0])]
        return out

    def _active_mask(self):
        """(K,) host float mask of active keyframe slots (from kf_slots — no
        device pull)."""
        mask = np.zeros(self.cfg.max_kf, np.float32)
        mask[list(self.kf_slots)] = 1.0
        return mask

    def _covisible_stale(self, slot, n, strong=False):
        """Neighbor selection from the most recent covisibility row cache
        regardless of which keyframe produced it (consecutive keyframes share
        most of their covisibles): used where an exact fresh row would cost a
        blocking device pull mid-event. The cached row's own keyframe keeps
        its (inflated) self-weight and therefore ranks first — which is the
        desired fixed observer / window member anyway."""
        cache = getattr(self, "_covis_row_cache", None)
        if cache is None:
            return (self._covisible_strong(slot, n) if strong
                    else self._covisible(slot, n))
        w = cache[1].copy()
        w[slot] = 0
        w = w * self._active_mask()
        order = np.argsort(-w)
        out = [int(k) for k in order[:n] if w[k] >= self.cfg.covis_th]
        if not strong and not out and w[order[0]] > 0:
            out = [int(order[0])]
        return out

    def _covisible_strong(self, slot, n):
        """Covisible neighbors that clear covis_th — no max-weight fallback.
        Used where a weakly-connected neighbor would do harm (e.g. as the only
        gauge-fixing observer of a local BA window)."""
        w = self._covis_row(slot)
        w[slot] = 0
        w = w * self._active_mask()
        order = np.argsort(-w)
        return [int(k) for k in order[:n] if w[k] >= self.cfg.covis_th]

    def _local_mapping(self):
        cfg = self.cfg
        slot = self.last_kf_slot
        # a previous event's deferred tail must be consumed before this event
        # overwrites it (forced: blocks if its copies haven't landed yet)
        self._harvest_event(force=True)
        # landmark maintenance: culling + capacity policies, occupancy
        # decisions in-graph (mapping.cull_and_evict) — zero host pulls
        with self.timers.stage("lm_cull"):
            self.m = mapping.cull_and_evict(self.m, jnp.asarray(self.frame_id),
                                            min_obs=cfg.cull_min_obs,
                                            n_evict=int(0.07 * self.m.P))
        # neighbor selection runs ON DEVICE (mapping.kf_neighbors): the whole
        # event is pull-free — culling/ref-tracked stats and loop detection
        # are dispatched at the end and harvested when their async copies
        # land (readiness-gated, see _harvest_event)
        with self.timers.stage("lm_nbrs"):
            nb4, nbv4, wslots, wvalid = mapping.kf_neighbors(
                self.m, jnp.asarray(slot, jnp.int32), covis_th=cfg.covis_th)
        # triangulate + fuse with top covisible neighbors: ONE scanned device
        # program each (padding pairs are no-ops), instead of 12 dispatches —
        # on a remote-attached chip every dispatch is a tunnel round trip and
        # this is the dominant share of the KF-event latency tax
        with self.timers.stage("lm_tri_fuse"):
            self.m, _ = mapping.create_points_with_neighbors(
                self.m, jnp.asarray(slot), nb4, self.cam,
                self.ext, n_levels=jnp.asarray(cfg.n_levels, jnp.int32))
            self.m, _ = mapping.fuse_neighbors(
                self.m, jnp.asarray(slot), nb4, nbv4, self.cam, self.ext)
        with self.timers.stage("lm_ba"):
            self._local_ba()
        # representative descriptors + normals/scale ranges of the points this
        # KF observes (ComputeDistinctiveDescriptors/UpdateNormalAndDepth run
        # after fusion in the reference, src/LocalMapping.cpp:1550). Runs
        # AFTER the window BA on purpose: under low-parallax geometry BA can
        # legitimately slide a landmark a long way along its viewing rays
        # (depth is weakly observable; reprojections barely move), and the
        # scale-band visibility gate (project_map_points) compares the CURRENT
        # camera-point distance against these stored bands — stale
        # creation-time bands after such a slide mass-reject perfectly
        # matchable points and tracking collapses within a few frames.
        if cfg.refresh_stats:
            with self.timers.stage("lm_refresh"):
                self.m = mapping.refresh_point_stats(
                    self.m, wslots, wvalid, self.ext,
                    n_levels=jnp.asarray(cfg.n_levels, jnp.int32))
        # end-of-event stats (post-BA pruning/fusion): DISPATCH ONLY — the
        # redundancy/ref-tracked decisions are harvested at the next frame's
        # harvest, by which time the async copy has landed (the old blocking
        # pull waited ~200 ms for the whole tri/fuse/BA chain to drain)
        stats2 = mapping.kf_event_stats(self.m, jnp.asarray(slot),
                                        min_obs=(2 if len(self.kf_slots) <= 2
                                                 else 3))
        detect_h = None
        if self._loop_gates_open():
            detect_h = self.loop.detect_dispatch(self.m, slot)
        for h in jax.tree_util.tree_leaves((stats2, detect_h)):
            try:
                h.copy_to_host_async()
            except Exception:
                pass
        import time as _t
        self._deferred_event = {"slot": slot, "stats": stats2,
                                "detect": detect_h,
                                "t_disp": _t.perf_counter()}
        # keep the tracking state synced to the (BA-updated) newest KF
        self.last_pose = self._kf_body_pose(slot)
        if self.vi_inited:
            self.last_ns = jax.tree_util.tree_map(
                lambda a: a[slot], self.m.kf_ns)
            self.prior = None          # marginal prior is stale after map update
            # re-integrate from the keyframe over any rows newer than its
            # cut (frames already in flight when the event ran)
            self.imu_since_frame = list(self.imu_since_kf)

    def _ba_window_slots(self):
        """Window for local BA: covisible KFs (visual) or the KF chain (VI).

        The VI window never extends back across a broken IMU chain
        (AddToLocalWindow restart semantics, src/LocalMapping.cpp:897-916): a
        window mixing pre-gap and post-gap keyframes with the connecting
        PRV/bias edges disabled leaves the newer island's biases anchored by
        nothing but weak visual roll information, and they diverge."""
        cfg = self.cfg
        slot = self.last_kf_slot
        if self.vi_inited:
            act = list(self.kf_slots)
            w = act[-cfg.local_window:]
            for i in range(len(w) - 1, 0, -1):
                if w[i] in self.broken_chain_slots:
                    w = w[i:]
                    break
            return w
        window = [slot] + self._covisible_stale(slot, cfg.ba_window - 1)
        # the previous keyframe is always a window member (consecutive-KF
        # covisibility; with a stale neighbor row it can be missing)
        if len(self.kf_slots) >= 2:
            prev = self.kf_slots[-2]
            if prev not in window:
                window = window[:cfg.ba_window - 1] + [prev]
        return window

    def _gather_obs(self, window, fixed):
        """Build a VisualObs batch from the observation tables of `window+fixed`
        keyframes (local index space)."""
        all_slots = window + fixed
        ks = jnp.asarray(all_slots, jnp.int32)
        Fn = self.m.F
        n = len(all_slots)
        cam_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), Fn)
        mp = self.m.kf_mp[ks].reshape(-1)
        uv = self.m.kf_uv[ks].reshape(-1, 2)
        lvl = self.m.kf_level[ks].reshape(-1)
        fv = self.m.kf_feat_valid[ks].reshape(-1)
        valid = (mp >= 0) & fv
        obs = VisualObs(
            cam=cam_idx, pt=jnp.clip(mp, 0, self.m.P - 1), uv=uv,
            inv_sigma2=1.0 / (1.2 ** (2.0 * lvl.astype(jnp.float32))),
            valid=valid.astype(jnp.float32),
            ur=(self.m.kf_ur[ks].reshape(-1) if self.sensor_depth else None))
        return obs

    def _local_ba(self, force_all=False, prune=True):
        cfg = self.cfg
        if force_all:
            window = list(self.kf_slots)
            if len(window) > 40:
                # large map: landmark-chunked Schur at padded shapes (dense
                # Wcp would be O(Nc*DC*Np*DP) — GBA must stay O(map))
                return self._global_ba_chunked(window, prune=prune)
            fixed = []
            # bucket-pad even the "rare" whole-map call: device compiles are
            # expensive (30-90 s through a remote-attached chip), and VI init
            # runs this once per new keyframe while it polls
            pad_to = int(np.ceil(len(window) / 8)) * 8
        else:
            window = self._ba_window_slots()
            # fixed observers: covisible KFs not in the window (strong edges
            # only — a weight-1 observer must not serve as the gauge anchor)
            fixed = [s for s in
                     self._covisible_stale(self.last_kf_slot,
                                           cfg.ba_window + 6, strong=True)
                     if s not in window][:4]
            # VI: the window front's chain predecessor joins as a FIXED vertex
            # carrying its PRV+bias edge into the window (pKFPrevLocal,
            # src/Optimizer.cpp LocalBAPRVIDP) — without it the window's bias
            # chain has no anchor to history and its weakly-observed axes walk
            prev_kf = None
            if self.vi_inited and window[0] not in self.broken_chain_slots:
                act = list(self.kf_slots)
                wi = act.index(window[0])
                if wi > 0:
                    prev_kf = act[wi - 1]
                    fixed = [prev_kf] + [s for s in fixed if s != prev_kf][:3]
            pad_to = max(cfg.ba_window, cfg.local_window) + 4  # ONE jit shape
        if len(window) < 2:
            return
        all_slots = window + fixed
        n_real = len(all_slots)
        if pad_to is not None and n_real < pad_to:
            all_slots = all_slots + [all_slots[-1]] * (pad_to - n_real)
        obs = self._gather_obs(window, fixed + all_slots[n_real:])
        # padded duplicate slots contribute no constraints (device-side mask:
        # a host-side np.array round trip here would block the async stream)
        if len(all_slots) > n_real:
            obs = obs._replace(
                valid=obs.valid * (obs.cam < n_real).astype(obs.valid.dtype))
        free = np.zeros(len(all_slots), np.float32)
        free[:len(window)] = 1.0
        # gauge: when no out-of-window observers anchor the problem, fix the
        # oldest window KF (reference fixes KF0 / the second-ring, and monocular
        # scale gauge is additionally damped by LM)
        if not fixed:
            free[0] = 0.0
        ks = jnp.asarray(all_slots, jnp.int32)
        if self.vi_inited:
            ns_w = jax.tree_util.tree_map(lambda a: a[ks], self.m.kf_ns)
            prev_idx = (len(window) if not force_all and prev_kf is not None
                        else None)
            edges = self._imu_edges(all_slots, len(window), prev_idx=prev_idx,
                                    n_pad=len(all_slots))
            # a window that STARTS at a chain break (post-reloc island) has no
            # history edge anchoring its bias chain: weakly-observed bias axes
            # (optical-axis gyro bias under low roll texture) random-walk and
            # can diverge. Pin the front keyframe's biases to their current
            # (reloc-window-recomputed) values with a weak prior.
            prior = None
            if not force_all and window[0] in self.broken_chain_slots:
                info = np.zeros((15, 15), np.float32)
                info[9:12, 9:12] = np.eye(3) / 2e-3 ** 2
                info[12:15, 12:15] = np.eye(3) / 2e-2 ** 2
                prior = ba_vi.PriorFactor(
                    cam=jnp.asarray(0, jnp.int32),
                    ns0=jax.tree_util.tree_map(lambda a: a[window[0]],
                                               self.m.kf_ns),
                    info=jnp.asarray(info), valid=jnp.asarray(1.0, jnp.float32))
            if cfg.use_idp_ba and not self.sensor_depth and not force_all:
                # flagship VI back end: anchored inverse-depth window BA
                # (LocalBAPRVIDP parity; DP=1 shrinks the landmark system 3x)
                ns2, pts2, chi2, idp_valid = self._vi_idp_ba(
                    ks, ns_w, edges, obs, jnp.asarray(free), prior=prior)
                obs = obs._replace(valid=idp_valid)  # anchor rows are not prunable
            else:
                ns2, pts2, chi2, cost = ba_vi.vi_ba(
                    ns_w, self.m.mp_pos, obs, edges, self.cam, self.ext, self.gw,
                    jnp.asarray(free), self.m.mp_active.astype(jnp.float32),
                    prior=prior, iters=8, bf=self._bf,
                    rtol=0.0 if force_all else cfg.ba_rtol,
                    two_phase=not force_all)
            self.m = self.m._replace(
                kf_ns=jax.tree_util.tree_map(
                    lambda full, w: full.at[ks].set(w), self.m.kf_ns, ns2),
                mp_pos=pts2)
        else:
            P0 = self.m.kf_ns.P[ks]
            R0 = self.m.kf_ns.R[ks]
            # windowed: reference local-BA protocol (outlier round; skipped
            # in abortable mode rtol>0). force_all: reference GBA = single
            # Huber run, no outlier round (src/Optimizer.cpp:3346/:629).
            P2, R2, pts2, chi2, cost = ba.visual_ba(
                P0, R0, self.m.mp_pos, obs, self.cam, self.ext,
                jnp.asarray(free), self.m.mp_active.astype(jnp.float32), iters=10,
                bf=self._bf, rtol=0.0 if force_all else cfg.ba_rtol,
                two_phase=not force_all)
            ns = self.m.kf_ns
            self.m = self.m._replace(
                kf_ns=ns._replace(P=ns.P.at[ks].set(P2), R=ns.R.at[ks].set(R2)),
                mp_pos=pts2)
        # remove outlier associations (chi2 gate) — skipped right after a loop
        # correction, where residuals are still settling and a mass prune would
        # destroy map connectivity
        if prune:
            self._prune_obs(all_slots, obs, chi2)

    def _global_ba_chunked(self, window, prune=True, kf_pad=32, chunk=1024):
        """Whole-map BA via ba_chunked (GlobalBundleAdjustment[NavStatePRV],
        src/Optimizer.cpp:3346/:629) — used beyond ~40 keyframes where the
        dense landmark system stops fitting the memory/compile budget."""
        n_real = len(window)
        pad_n = int(np.ceil(n_real / kf_pad)) * kf_pad
        all_slots = window + [window[-1]] * (pad_n - n_real)
        ks = jnp.asarray(all_slots, jnp.int32)
        obs = self._gather_obs(window, all_slots[n_real:])
        # padded slots contribute no constraints (device-side mask)
        obs = obs._replace(
            valid=obs.valid * (obs.cam < n_real).astype(obs.valid.dtype))
        free = np.zeros(pad_n, np.float32)
        free[1:n_real] = 1.0               # gauge: oldest KF fixed
        n_chunks = max(1, self.m.P // chunk)
        cobs, C = ba_chunked.chunk_observations(
            np.asarray(obs.cam), np.asarray(obs.pt), np.asarray(obs.uv),
            np.asarray(obs.inv_sigma2), np.asarray(obs.valid), self.m.P,
            n_chunks, ur=None if obs.ur is None else np.asarray(obs.ur))
        pt_mask = self.m.mp_active.astype(jnp.float32)
        if self.vi_inited:
            ns_w = jax.tree_util.tree_map(lambda a: a[ks], self.m.kf_ns)
            edges = self._imu_edges(all_slots, n_real, n_pad=pad_n)
            ns2, pts2, cost = ba_chunked.vi_gba_chunked(
                ns_w, self.m.mp_pos, cobs, edges, self.cam, self.ext, self.gw,
                jnp.asarray(free), pt_mask, iters=8, bf=self._bf)
            self.m = self.m._replace(
                kf_ns=jax.tree_util.tree_map(
                    lambda full, w: full.at[ks].set(w), self.m.kf_ns, ns2),
                mp_pos=pts2)
        else:
            P0 = self.m.kf_ns.P[ks]
            R0 = self.m.kf_ns.R[ks]
            P2, R2, pts2, cost = ba_chunked.visual_gba_chunked(
                P0, R0, self.m.mp_pos, cobs, self.cam, self.ext,
                jnp.asarray(free), pt_mask, iters=10, bf=self._bf)
            ns = self.m.kf_ns
            self.m = self.m._replace(
                kf_ns=ns._replace(P=ns.P.at[ks].set(P2), R=ns.R.at[ks].set(R2)),
                mp_pos=pts2)
        if prune:
            # per-obs chi2 in one flat pass (no Schur structures involved)
            ns = self.m.kf_ns
            P_o = ns.P[ks][obs.cam]
            R_o = ns.R[ks][obs.cam]
            r, _, _, z = factors.reproj_xyz(self.cam, self.ext, P_o, R_o,
                                            self.m.mp_pos[obs.pt], obs.uv)
            chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
            chi2 = jnp.where(z > 0, chi2, jnp.full_like(chi2, 1e9))
            self._prune_obs(all_slots, obs, chi2)

    def _vi_idp_ba(self, ks, ns_w, edges, obs, free, prior=None):
        """Anchored inverse-depth VI window BA (Optimizer::LocalBAPRVIDP,
        src/Optimizer.cpp:32-630) on the solver in ba_vi_idp.

        Each observed landmark is re-anchored to its first (lowest local index)
        observing keyframe in this problem; its state becomes the 1-D inverse
        depth along that anchor ray. Points without an in-problem anchor (or
        seen only by their anchor) keep their world position. Returns
        (ns, mp_pos, chi2, idp_valid) with chi2/idp_valid aligned to `obs`.
        """
        n = int(ks.shape[0])
        P = self.m.P
        BIGI = jnp.int32(2 ** 30)
        cam_idx = obs.cam                      # (n*F,) local kf index
        mp = obs.pt                            # (n*F,) landmark slot (clipped)
        ov = obs.valid > 0
        # anchor: first observing local kf per point
        anchor_loc = jnp.full((P,), BIGI).at[mp].min(
            jnp.where(ov, cam_idx, BIGI), mode="drop")
        has_anchor = anchor_loc < n
        anchor_cl = jnp.clip(anchor_loc, 0, n - 1)
        is_anchor_obs = ov & (cam_idx == anchor_cl[mp]) & has_anchor[mp]
        # exactly one anchoring obs per point -> plain scatter is race-free
        uv0 = jnp.zeros((P, 2), obs.uv.dtype).at[
            jnp.where(is_anchor_obs, mp, P)].set(obs.uv, mode="drop")
        rho0 = ba_vi_idp.xyz_to_idp(
            self.m.mp_pos, ns_w.P[anchor_cl], ns_w.R[anchor_cl], uv0,
            self.cam, self.ext)
        idp_valid = (ov & ~is_anchor_obs & has_anchor[mp]).astype(jnp.float32)
        idp_obs = ba_vi_idp.IDPObs(
            anchor=anchor_cl[mp], obs_kf=cam_idx, pt=mp,
            uv0=uv0[mp], uv=obs.uv, inv_sigma2=obs.inv_sigma2,
            valid=idp_valid)
        # a rho is free only if some non-anchor observation constrains it
        rho_free = (jnp.zeros((P,), jnp.float32).at[mp].max(idp_valid, mode="drop")
                    * self.m.mp_active)
        ns2, rho, chi2, cost = ba_vi_idp.vi_ba_idp(
            ns_w, rho0, idp_obs, edges, self.cam, self.ext, self.gw,
            free, rho_free, iters=8, prior=prior, rtol=self.cfg.ba_rtol)
        Xw = ba_vi_idp.idp_to_xyz(rho, uv0, ns2.P[anchor_cl], ns2.R[anchor_cl],
                                  self.cam, self.ext)
        mp_pos = jnp.where((rho_free > 0)[:, None], Xw, self.m.mp_pos)
        return ns2, mp_pos, chi2, idp_valid

    def _prune_obs(self, slots, obs, chi2):
        gate = jnp.asarray(ba.CHI2_MONO) if obs.ur is None else \
            jnp.where(obs.ur >= 0, ba.CHI2_STEREO, ba.CHI2_MONO)
        self.m = mapping.prune_associations(
            self.m, jnp.asarray(slots, jnp.int32), chi2, obs.valid, gate)

    def _imu_edges(self, all_slots, n_window, prev_idx=None, n_pad=None):
        """PRV edges along consecutive window KFs (local index space).

        prev_idx: optional local index of the window front's (fixed) chain
        predecessor — adds the predecessor->front edge (the window front's own
        stored preintegration), anchoring the window's bias chain to history
        (pKFPrevLocal edge, src/Optimizer.cpp LocalBAPRVIDP).

        n_pad: structural edge-list length (defaults to n_window). The edge
        count must be a function of the PADDED window size, not the live one,
        or every window-size change recompiles the whole BA program — fatal
        when device compiles are expensive. The prev-edge slot is always
        present structurally (valid=0 when unused) for the same reason."""
        n_pad = n_pad if n_pad is not None else n_window
        # slot 0: predecessor edge (structural; masked off when prev_idx None)
        idx_i = [prev_idx if prev_idx is not None else 0]
        idx_j = [0]
        slots_j = [all_slots[0]]
        ev = [1.0 if (prev_idx is not None
                      and all_slots[0] not in self.broken_chain_slots) else 0.0]
        for a, b in zip(range(n_pad - 1), range(1, n_pad)):
            idx_i.append(a)
            idx_j.append(b)
            slots_j.append(all_slots[b])
            ev.append(1.0 if (b < n_window
                              and all_slots[b] not in self.broken_chain_slots)
                      else 0.0)
        # one batched gather per preint leaf (a per-edge tree_map issues
        # hundreds of tiny device ops on a remote-attached chip)
        ksj = jnp.asarray(slots_j, jnp.int32)
        pre = jax.tree_util.tree_map(lambda x: x[ksj], self.m.kf_preint)
        info_prv = factors.imu_prv_info(pre)
        info_bias = factors.bias_rw_info(pre.dT, float(self.noise.sigma_bg),
                                         float(self.noise.sigma_ba))
        evj = jnp.asarray(ev, jnp.float32)
        # a structurally-present but masked edge can carry a degenerate preint
        # (dT=0 identity) whose info is inf/NaN; 0 * inf = NaN would poison the
        # system, so replace masked-edge infos with identity
        sel = evj[:, None, None] > 0
        info_prv = jnp.where(sel, info_prv, jnp.eye(9, dtype=info_prv.dtype))
        info_bias = jnp.where(sel, info_bias, jnp.eye(6, dtype=info_bias.dtype))
        return ba_vi.IMUEdges(
            i=jnp.asarray(idx_i, jnp.int32), j=jnp.asarray(idx_j, jnp.int32),
            pre=pre, info_prv=info_prv, info_bias=info_bias,
            valid=evj)

    def _cull_keyframes(self, ratio_all=None, npts_all=None):
        """90% redundancy rule with VI time-gap guards (src/LocalMapping.cpp:1777):
        never cull within 0.11 s of the current KF; gap(next, prev) must stay
        under 0.51 s, relaxed to 3.01 s for VI-inited KFs older than 4 s; the
        local-window front and its predecessor are protected."""
        t_cur = self.kf_time_host[self.last_kf_slot]
        # redundancy for every KF in ONE batched pass per removal round:
        # each removal changes observation counts, so recompute before
        # accepting the next candidate (matches the reference's sequential
        # reevaluation) — zero-removal events reuse the event's stats pull
        first = True
        while True:
            active = list(self.kf_slots)
            # loop-edge carriers are never culled (SetNotErase semantics)
            protected = {s for e in self.loop_edges for s in e[:2]}
            if self.cfg.use_imu and len(active) > self.cfg.local_window:
                wfront = len(active) - self.cfg.local_window
                protected |= {active[wfront], active[wfront - 1]}
            # recent keyframes are the live triangulation partners: culling
            # one drops its brand-new points below min_obs and the landmark
            # cull erases them before they mature — under fast panning this
            # starves tracking into a loss spiral (r4 regression: the async
            # event pipeline made culling fire a frame later, exactly when
            # the next KF's points were 1-observation young). The reference's
            # equivalent protection is implicit: its redundancy test demands
            # >= 3 observers AT OR FINER SCALE, which new points near the
            # sweep head never satisfy (src/LocalMapping.cpp:1777-1914).
            # Depth 8 (the visual BA window) verified: 4 still spirals on the
            # fast-pan loop world; culling is only DELAYED until a KF leaves
            # the window.
            protected |= set(active[-max(8, self.cfg.ba_window):])
            if first and ratio_all is not None:
                first = False
            else:
                ratio_all, npts_all = map(np.asarray,
                                          mapping.kf_redundancy_all(self.m))
            removed = False
            for i, s in enumerate(active[1:-1], start=1):
                if s in protected:
                    continue
                if self.cfg.use_imu:
                    t_prev = self.kf_time_host[active[i - 1]]
                    t_next = self.kf_time_host[active[i + 1]]
                    t_s = self.kf_time_host[s]
                    if t_s >= t_cur - 0.11:
                        continue
                    timegap = 0.51
                    if self.vi_inited and t_s < t_cur - 4.0:
                        timegap = 3.01
                    if t_next - t_prev > timegap:
                        continue
                if ratio_all[s] > 0.9 and npts_all[s] > 20:
                    self._remove_keyframe(s)
                    removed = True
                    break
            if not removed:
                break

    def _splice_imu_chain(self, slot):
        """On KF removal, merge its raw IMU into the next KF and re-preintegrate
        (KeyFrame::SetBadFlag splicing, src/KeyFrame.cpp:1028-1030)."""
        if not self.cfg.use_imu:
            return
        act = self.kf_slots
        i = act.index(slot)
        if i + 1 >= len(act):
            return
        nxt = act[i + 1]
        merged = np.concatenate(
            [self.kf_imu_raw.get(slot, np.zeros((0, 7), np.float32)),
             self.kf_imu_raw.get(nxt, np.zeros((0, 7), np.float32))], 0)
        self.kf_imu_raw[nxt] = merged
        bg = self.m.kf_ns.bg[nxt] + self.m.kf_ns.dbg[nxt]
        ba_ = self.m.kf_ns.ba[nxt] + self.m.kf_ns.dba[nxt]
        pre = self._preintegrate_raw(merged, bg, ba_)
        self.m = self.m._replace(kf_preint=jax.tree_util.tree_map(
            lambda a, b: a.at[nxt].set(b), self.m.kf_preint, pre))

    def _track_reference_kf(self, feats, uv):
        """TrackReferenceKeyFrame (src/Tracking.cpp:1524): when both motion-
        model searches fail, match the frame's descriptors against the
        reference keyframe's landmark features (no motion prior), solve PnP,
        and refine against the map. Returns a TrackResult or None."""
        from mc_slam_tpu.frontend import matching as matching_mod
        k = self.last_kf_slot
        if k is None or k not in self.kf_slots:
            return None
        mp_k = self.m.kf_mp[k]
        has = (mp_k >= 0) & self.m.kf_feat_valid[k]
        idx, best, okm = matching_mod.mutual_match(
            feats.desc_pm1, feats.valid, self.m.kf_pm1[k], has,
            max_dist=matching_mod.TH_LOW, ratio=0.85,
            angle_a=feats.angle, angle_b=self.m.kf_angle[k])
        if int(jnp.sum(okm)) < 15:
            return None
        xn = (np.asarray(uv) - [float(self.cam.cx), float(self.cam.cy)]) / \
            [float(self.cam.fx), float(self.cam.fy)]
        Xw = self.m.mp_pos[jnp.clip(mp_k[idx], 0, self.m.P - 1)]
        self.key, sub = jax.random.split(self.key)
        res = pnp.pnp_ransac(sub, Xw, jnp.asarray(xn, jnp.float32),
                             okm.astype(jnp.float32), float(self.cam.fx),
                             min_inliers=12)
        if not bool(res.ok):
            return None
        R_wc = res.R_cw.T
        C = -(R_wc @ res.t_cw[..., None])[..., 0]
        P_b, R_b = self._cam_to_body(C, R_wc)
        tr = tracking.track_frame_visual(self.m, feats, uv, self.cam, self.ext,
                                         P_b, R_b, radius_coarse=15.0,
                                         feat_ur=self._cur_ur, bf=self._bf)
        if int(tr.n_inliers) < self.cfg.min_track_inliers:
            return None
        return tr

    # ------------------------------------------------------------------
    # Relocalization (Tracking::Relocalization, src/Tracking.cpp:2388):
    # BoW candidates -> 2D-3D descriptor matching -> PnP RANSAC -> refine
    # ------------------------------------------------------------------
    def _relocalize(self, feats, uv, t):
        from mc_slam_tpu.frontend import matching as matching_mod
        cfg = self.cfg
        act = list(self.kf_slots)
        if not act:
            return False
        q = bow.bow_histogram(feats.desc_pm1,
                              feats.valid.astype(jnp.float32),
                              self.loop.vocab)
        scores = np.asarray(self.loop.hists @ q)[act]
        focal = float(self.cam.fx)
        xn = (np.asarray(uv) - [float(self.cam.cx), float(self.cam.cy)]) / \
            [float(self.cam.fx), float(self.cam.fy)]
        # candidate set as the reference: everything scoring >= 0.75x the best
        # accumulated score (KeyFrameDatabase::DetectRelocalizationCandidates),
        # capped — reloc runs at frame rate while lost, so the cap bounds the
        # per-frame host work
        order = np.argsort(-scores)
        best_s = scores[order[0]] if len(order) else 0.0
        cand = [int(oi) for oi in order[:5] if scores[int(oi)] >= 0.75 * best_s]
        for oi in cand:
            k = act[int(oi)]
            mp_k = self.m.kf_mp[k]
            has = (mp_k >= 0) & self.m.kf_feat_valid[k]
            idx, best, okm = matching_mod.mutual_match(
                feats.desc_pm1, feats.valid, self.m.kf_pm1[k], has,
                max_dist=matching_mod.TH_LOW, ratio=0.85,
                angle_a=feats.angle, angle_b=self.m.kf_angle[k])
            if int(jnp.sum(okm)) < 15:
                continue
            Xw = self.m.mp_pos[jnp.clip(mp_k[idx], 0, self.m.P - 1)]
            self.key, sub = jax.random.split(self.key)
            res = pnp.pnp_ransac(sub, Xw, jnp.asarray(xn, jnp.float32),
                                 okm.astype(jnp.float32), focal,
                                 min_inliers=12)
            if not bool(res.ok):
                continue
            # camera pose -> body pose, then refine against the map
            R_wc = res.R_cw.T
            C = -(R_wc @ res.t_cw[..., None])[..., 0]
            P_b, R_b = self._cam_to_body(C, R_wc)
            tr = tracking.track_frame_visual(self.m, feats, uv, self.cam,
                                             self.ext, P_b, R_b,
                                             radius_coarse=15.0)
            if 0 < cfg.min_track_inliers - int(tr.n_inliers) <= 4:
                # near miss: escalate with a wider guided re-search from the
                # refined pose, as the reference's second SearchByProjection
                # pass when 10 < inliers < 50 (src/Tracking.cpp:2388-2566)
                tr2 = tracking.track_frame_visual(
                    self.m, feats, uv, self.cam, self.ext, tr.P, tr.R,
                    radius_coarse=30.0)
                if int(tr2.n_inliers) > int(tr.n_inliers):
                    tr = tr2
            if int(tr.n_inliers) >= cfg.min_track_inliers:
                self.last_pose = (tr.P, tr.R)
                self.velocity = (jnp.zeros(3), jnp.eye(3))
                self._cur_feat_mp = tr.feat_mp
                self._cur_inliers = int(tr.n_inliers)
                if self.vi_inited:
                    # re-seat the NavState and open the 20-frame bias window
                    # (Relocalization sets mbRelocBiasPrepare,
                    # src/Tracking.cpp:2388; biases re-solved after 20 frames
                    # by RecomputeIMUBiasAndCurrentNavstate :47-220)
                    self.last_ns = self.last_ns._replace(
                        P=tr.P, R=tr.R, V=jnp.zeros(3))
                    self.prior = None
                    self.reloc_buf = []
                    self.imu_since_frame = []
                    self.imu_since_kf = []
                    self._chain_break_pending = True
                self.state = OK
                self.events.append((self.frame_id, "reloc",
                                    dict(kf=k, n_in=int(tr.n_inliers))))
                return True
        return False

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
                fix_scale=self.vi_inited)
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
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
                jnp.asarray(cv["t"]), self.cam)
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
                                        loop_edges=self.loop_edges)
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

    # ------------------------------------------------------------------
    # VI initialization (LocalMapping::TryInitVIO, src/LocalMapping.cpp:200-893)
    # ------------------------------------------------------------------
    def _maybe_vi_init(self, t):
        cfg = self.cfg
        if self.first_kf_time is None or t - self.first_kf_time < cfg.vi_init_time:
            return
        act = list(self.kf_slots)
        if len(act) < 8:
            return
        # only attempt once per new keyframe (the reference polls, but each
        # attempt re-runs the same data until the map grows)
        if getattr(self, "_last_init_attempt_nkf", -1) == self.n_kf:
            return
        self._last_init_attempt_nkf = self.n_kf
        # clean the visual map first (TryInitVIO runs a visual-only GBA at
        # src/LocalMapping.cpp:240 before the linear solves)
        with self.timers.stage("viinit_gba_vis"):
            self._local_ba(force_all=True)
        # pad the keyframe window to a 16-bucket so the init solve compiles a
        # handful of shapes instead of one per keyframe count (the solvers are
        # mask-aware: padded rows carry valid=0)
        n_real = len(act)
        pad_n = int(np.ceil(n_real / 16)) * 16
        act_p = act + [act[-1]] * (pad_n - n_real)
        ks = jnp.asarray(act_p, jnp.int32)
        # camera poses from body poses (body==camera pre-init)
        Rwb = self.m.kf_ns.R[ks]
        Pwb = self.m.kf_ns.P[ks]
        Rbc = jnp.swapaxes(self.ext.Rcb, -1, -2)
        pbc = -(Rbc @ self.ext.tcb[..., None])[..., 0]
        Rwc = Rwb @ Rbc
        Pwc = Pwb + (Rwb @ pbc[..., None])[..., 0]
        pre = jax.tree_util.tree_map(lambda a: a[ks], self.m.kf_preint)
        valid = jnp.asarray([0.0] + [1.0] * (n_real - 1)
                            + [0.0] * (pad_n - n_real), jnp.float32)
        import time as _time
        _t0 = _time.perf_counter()
        with self.timers.stage("viinit_solve"):
            res = viinit.try_init_vio(Pwc, Rwc, pre, valid, self.ext.Rcb,
                                      self.ext.tcb, g_mag=cfg.g_mag)
            res = jax.tree_util.tree_map(np.asarray, res)
        if self.viinit_log is not None:
            self.viinit_log.log_attempt(t, res,
                                        (_time.perf_counter() - _t0) * 1e3)
        s = float(res.scale)
        if not np.isfinite(s) or s <= 1e-3:
            return
        # acceptance gating beyond the 15 s rule: the step-3 system must be
        # well-conditioned and its scale must agree with the step-2 estimate —
        # a disagreement means the trajectory has not excited scale/gravity
        # yet and the init would seed a wrong-metric map (VI-ORB IV-C
        # diagnostics; reference surfaces them in plotinit)
        sv = np.asarray(res.cond)
        cond = float(sv[0] / max(float(sv[-1]), 1e-12))
        s_star = float(res.scale_star)
        if cond > cfg.vi_init_max_cond:
            return
        if abs(s - s_star) > cfg.vi_init_scale_tol * max(s, 1e-6):
            return
        # re-preintegrate all KFs with the estimated gyro bias
        bg = np.asarray(res.bg)
        ba_np = np.asarray(res.ba)
        with self.timers.stage("viinit_repreint"):
            for slot in act:
                raw = self.kf_imu_raw.get(slot)
                if raw is None:
                    continue
                pre1 = self._preintegrate_raw(raw, jnp.asarray(bg, jnp.float32),
                                              jnp.asarray(ba_np, jnp.float32))
                self.m = self.m._replace(kf_preint=jax.tree_util.tree_map(
                    lambda a, b: a.at[slot].set(b), self.m.kf_preint, pre1))
        pre2 = jax.tree_util.tree_map(lambda a: a[ks], self.m.kf_preint)
        V = viinit.compute_velocities(Pwc, Rwc, pre2, valid, self.ext.Rcb,
                                      self.ext.tcb, jnp.asarray(s), res.gw,
                                      jnp.asarray(ba_np))
        P_b, R_b, V = viinit.apply_init_to_navstates(
            Pwc, Rwc, self.ext.Rcb, self.ext.tcb, jnp.asarray(s),
            res.bg, res.ba, V)
        # padded rows scatter onto the same slot as the last real row — they
        # must carry its values, not pad garbage (shape-stable gather: the
        # clamp index is data, so no per-count recompile)
        row = jnp.minimum(jnp.arange(pad_n), jnp.asarray(n_real - 1))
        P_b, R_b, V = P_b[row], R_b[row], V[row]
        ns = self.m.kf_ns
        z3 = jnp.zeros_like(V)
        ns = ns._replace(
            P=ns.P.at[ks].set(P_b), R=ns.R.at[ks].set(R_b), V=ns.V.at[ks].set(V),
            bg=ns.bg.at[ks].set(jnp.asarray(bg)), ba=ns.ba.at[ks].set(jnp.asarray(ba_np)),
            dbg=ns.dbg.at[ks].set(z3), dba=ns.dba.at[ks].set(z3))
        # scale map points
        self.m = self.m._replace(
            kf_ns=ns, mp_pos=self.m.mp_pos * s,
            mp_min_dist=self.m.mp_min_dist * s, mp_max_dist=self.m.mp_max_dist * s)
        # rescale the recorded per-frame trajectory to the new metric unit
        # (Map::UpdateScale analog for the saved-frame list): P_rel offsets
        # were captured in the pre-init visual scale — composing them
        # unscaled against the rescaled keyframe poses leaves every pre-init
        # frame ~s x off and dominates full-run ATE
        self.traj.rescale(s)
        self.gw = res.gw
        self.vi_inited = True
        self.events.append((self.frame_id, "vi_init",
                            dict(scale=round(s, 4), n_kf=len(act))))
        self.last_ns = jax.tree_util.tree_map(lambda a: a[act[-1]], ns)
        self.last_pose = (self.last_ns.P, self.last_ns.R)
        # the next VI-tracked frame integrates from the newest keyframe
        self.imu_since_frame = list(self.imu_since_kf)
        self.prior = None
        # full VI global BA (GlobalBundleAdjustmentNavStatePRV)
        with self.timers.stage("viinit_gba_vi"):
            self._local_ba(force_all=True)
        self.last_ns = jax.tree_util.tree_map(lambda a: a[act[-1]], self.m.kf_ns)
        self.last_pose = (self.last_ns.P, self.last_ns.R)

    # ------------------------------------------------------------------
    def set_localization_mode(self, on: bool):
        """Activate/DeactivateLocalizationMode (include/System.h:83-87): track
        against the frozen map without inserting keyframes or mapping."""
        self.localization_only = bool(on)

    def reset(self):
        """System::Reset semantics: clear the map and start over
        (src/Tracking.cpp:2569)."""
        self.__init__(self.cam, self.cfg, Tbc=self._Tbc, noise=self.noise)

    def global_refine(self):
        """One full-map bundle adjustment over all active keyframes
        (GlobalBundleAdjustment(NavStatePRV), src/Optimizer.cpp:629/3346 — the
        reference runs it after loop closures; offline drivers may also call
        it once at sequence end before saving the trajectory)."""
        self._harvest_pending(drain=True)
        self._local_ba(force_all=True, prune=False)
        self._invalidate_frame_caches()

    def get_trajectory(self):
        """[(t, P_wb (3,), R_wb (3,3))] per tracked frame, composed against the
        CURRENT keyframe poses (System::SaveTrajectoryTUM semantics): frames
        recorded before VI init / loop closures / GBA inherit those
        corrections through their reference keyframe. Frames whose reference
        keyframe was culled (or its slot recycled) keep their track-time pose."""
        self.flush()
        kf_P = np.asarray(self.m.kf_ns.P)
        kf_R = np.asarray(self.m.kf_ns.R)
        kf_id = np.asarray(self.m.kf_id)
        kf_act = np.asarray(self.m.kf_active)
        return self.traj.compose(kf_P, kf_R, kf_id, kf_act)
