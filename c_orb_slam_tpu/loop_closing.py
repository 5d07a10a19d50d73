"""Loop closing: detection, Sim(3) computation, correction, pose graph, GBA.

Reference: src/LoopClosing.cc — a persistent thread consuming keyframes
(Run :57-88): DetectLoop (:103-229, BoW candidates with min-score from
covisible KFs :121-138, consecutive-consistency groups th=3 :152-211,
10-KF dead time :114), ComputeSim3 (:231-400: SearchByBoW >=20 ->
Sim3Solver RANSAC -> SearchBySim3 -> OptimizeSim3 >=20 -> projection
widening, accept >=40), CorrectLoop (:402-585: stop mapping, propagate
corrected Sim3 to the covisibility group :447-516, fuse duplicates
:518-542, OptimizeEssentialGraph :567, spawn GlobalBundleAdjustment
thread :579).

TPU-native: a stage invoked by the host loop after local mapping
(SURVEY.md §2.3 — stages instead of threads; GBA's abort flag becomes a
bounded iteration budget). Candidate scoring is one batched BoW gather
over all keyframes (bow/database.py); Sim3 RANSAC evaluates every
hypothesis in one vmapped pass (ops/sim3solve.py); the essential graph is
a fixed-shape Sim3 pose-graph GN with implicit PCG (optim/pose_graph.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

import jax

from c_orb_slam_tpu.bow import vocab as vocab_mod
from c_orb_slam_tpu.bow.database import (
    KeyFrameDatabase, SparseBow, aggregate_bow, aggregate_bow_dev, _set_row,
)
from c_orb_slam_tpu.config import SlamConfig, Sensor
from c_orb_slam_tpu.utils.host import fetch, fetch_async, prefetch
from c_orb_slam_tpu.geometry import camera, np_se3, se3, sim3
from c_orb_slam_tpu.ops import match, sim3solve
from c_orb_slam_tpu.optim import ba as ba_mod
from c_orb_slam_tpu.optim import pose_graph, sim3_opt
from c_orb_slam_tpu.slam_map.mapstate import MapState

import os

_DEBUG = bool(os.environ.get("SLAM_DEBUG"))


def _dbg(*args):
    if _DEBUG:
        print("[loop]", *args)


_classify_inliers_jit = jax.jit(
    ba_mod.classify_inliers, static_argnames=("chi2_mono", "chi2_stereo")
)


class _GbaJob:
    """In-flight snapshot-epoch global BA (see LoopClosing._start_gba).

    Owns a device-resident BAProblem; advance() dispatches ONE jitted LM
    iteration (async — never blocks the host), walking the two-stage
    schedule of bundle_adjust (huber stage -> inlier reclassification ->
    clean stage) one chunk per call. finished() goes true once the final
    readback has landed."""

    def __init__(self, problem, kfs, kf_serials, pts, pt_serials,
                 iters_first, iters_second, pcg_iters,
                 chi2_mono, chi2_stereo):
        self.p = problem
        self.kfs = kfs
        self.kf_serials = kf_serials
        self.pts = pts
        self.pt_serials = pt_serials
        self.iters_first = iters_first
        self.iters_second = iters_second
        self.pcg_iters = pcg_iters
        self.chi2_mono = chi2_mono
        self.chi2_stereo = chi2_stereo
        self.stage = 0  # 0 huber LM, 1 clean LM, 2 fetch, 3 done
        self.i = 0
        self.lam = jnp.asarray(1e-4, jnp.float32)
        self.err = None
        self._fut = None
        # CPU: the done() probe would make the apply frame depend on
        # background-thread scheduling (same determinism rationale as
        # LocalMapping._fixed_defer); apply as soon as the fetch is
        # dispatched instead.
        self._fixed = jax.default_backend() == "cpu"

    def advance(self):
        if self.stage >= 2:
            return
        use_huber = self.stage == 0
        if self.err is None:
            self.err = ba_mod.stage_error(
                self.p, use_huber=use_huber,
                chi2_mono=self.chi2_mono, chi2_stereo=self.chi2_stereo,
            )
        cam_T, points, self.lam, self.err = ba_mod.lm_step(
            self.p, self.lam, self.err, use_huber=use_huber,
            chi2_mono=self.chi2_mono, chi2_stereo=self.chi2_stereo,
            pcg_iters=self.pcg_iters,
        )
        self.p = self.p._replace(cam_T=cam_T, points=points)
        self.i += 1
        if self.stage == 0 and self.i >= self.iters_first:
            inlier = _classify_inliers_jit(
                self.p, chi2_mono=self.chi2_mono,
                chi2_stereo=self.chi2_stereo,
            )
            self.p = self.p._replace(obs_valid=inlier)
            self.stage, self.i = 1, 0
            self.lam = jnp.asarray(1e-4, jnp.float32)
            self.err = None
        elif self.stage == 1 and self.i >= self.iters_second:
            self.stage = 2
            self._fut = fetch_async(self.p.cam_T, self.p.points)

    def ready(self, force: bool) -> bool:
        return self.stage == 2 and (
            force or self._fixed or self._fut.done()
        )

    def result(self):
        cam_T, points = self._fut.result()
        self.stage = 3
        return np.asarray(cam_T), np.asarray(points)


class _ShardedGbaJob:
    """Multi-device variant of _GbaJob: the snapshot problem is dispatched
    ONCE through parallel/sharded_ba (map sharded over the device mesh,
    camera Schur system reduce-scattered over ICI) and polled for its
    async readback. No per-frame chunking: with D devices the whole solve
    is one SPMD program and the host never blocks on it until ready."""

    def __init__(self, problem, kfs, kf_serials, pts, pt_serials,
                 iters_first, iters_second, pcg_iters,
                 chi2_mono, chi2_stereo):
        from c_orb_slam_tpu.parallel import sharded_ba

        self.kfs = kfs
        self.kf_serials = kf_serials
        self.pts = pts
        self.pt_serials = pt_serials
        (cam_T, points, _inlier, _chi2), _pp = sharded_ba.sharded_bundle_adjust(
            problem,
            iters_first=iters_first,
            iters_second=iters_second,
            pcg_iters=pcg_iters,
            chi2_mono=chi2_mono,
            chi2_stereo=chi2_stereo,
        )
        # Padding is appended, ids preserved: slice back to the snapshot.
        self._fut = fetch_async(cam_T[: len(kfs)], points[: len(pts)])
        self.stage = 2

    def advance(self):
        pass

    def ready(self, force: bool) -> bool:
        return self.stage == 2 and (force or self._fut.done())

    def result(self):
        cam_T, points = self._fut.result()
        self.stage = 3
        return np.asarray(cam_T), np.asarray(points)


class LoopClosing:
    def __init__(self, cfg: SlamConfig, mapstate: MapState,
                 vocabulary: Optional[vocab_mod.Vocabulary] = None):
        self.cfg = cfg
        self.map = mapstate
        self.K = camera.intrinsics_array(cfg.camera)
        self.sigma2 = np.asarray(cfg.orb.level_sigma2(), np.float32)
        self.fix_scale = cfg.sensor != Sensor.MONOCULAR
        self.voc = vocabulary
        self.db: Optional[KeyFrameDatabase] = None
        Nk = mapstate.kf_desc.shape[0]
        self.kp_cap = mapstate.kf_desc.shape[1]
        # Per-keyframe vocabulary-node ids, device-resident (used as the
        # BoW matching gate; uploading per query was a ~8MB h2d).
        self.kf_node_dev = jnp.full((Nk, self.kp_cap), -1, jnp.int32)
        self._pending: list[int] = []  # keyframes awaiting vocabulary
        # Detection pipeline: (kf, connected, node, bow_w, bow_wt,
        # score_dev, n_shared_dev) dispatched this frame, applied next
        # frame when the prefetched score readback has landed.
        self._pending_detect = None
        self.last_loop_kf: int = -1000000
        self.last_loop_serial: int = -(1 << 40)
        self.consistent_groups: list[tuple[set, int]] = []
        self.loop_edges: list[tuple[int, int]] = []  # prior loop edges
        self._rng = jax.random.PRNGKey(cfg.vocabulary.seed + 1)
        self.n_loops_closed = 0
        # In-flight snapshot-epoch global BA (None when idle) + counter of
        # applied background solves.
        self.gba_job: Optional[_GbaJob] = None
        self.n_gba_applied = 0
        self.last_gba_kind = None
        # Detection-scoring readbacks defer (bounded) on accelerator
        # backends to keep the frame loop non-blocking; on CPU the result
        # is already local and deferral only adds load-dependent timing
        # variance (same rationale as LocalMapping._defer_applies).
        self._defer_detect = jax.default_backend() != "cpu"
        # Set by System so a loop correction also fixes the tracker state.
        self.on_pose_correction = None
        # Fired at the top of _correct_loop, BEFORE any map mutation: the
        # tracker drains its in-flight pipelined frames here, because they
        # were dispatched in the pre-correction world frame (the
        # reference's Tracking reads poses under mMutexMapUpdate instead,
        # LoopClosing.cc:445).
        self.on_before_correction = None
        # Evict culled keyframes from the place-recognition database
        # (reference: KeyFrame::SetBadFlag erases from KeyFrameDatabase,
        # KeyFrame.cc:543).
        mapstate.on_kf_erased = self._on_kf_erased

    def _on_kf_erased(self, k: int):
        if self.db is not None:
            self.db.erase(k)

    # ------------------------------------------------------------------
    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _ensure_vocabulary(self, kf: int) -> bool:
        """Train the vocabulary from the first keyframes when none was
        provided (the reference instead loads the pretrained 140MB
        ORBvoc.txt, System.cc:64; absent from the snapshot — SURVEY.md §0)."""
        if self.voc is not None:
            return True
        self._pending.append(kf)
        if len(self._pending) < max(self.cfg.vocabulary.train_keyframes, 1):
            return False
        descs = []
        for k in self._pending:
            v = self.map.kf_kp_valid[k]
            descs.append(self.map.kf_desc[k][v])
        self.voc = vocab_mod.train_vocabulary(
            descs,
            k=self.cfg.vocabulary.branching,
            L=self.cfg.vocabulary.depth,
            levels_up=self.cfg.vocabulary.levels_up,
            seed=self.cfg.vocabulary.seed,
        )
        for k in self._pending[:-1]:
            self._index_keyframe(k)
        self._pending.clear()
        return True

    def _ensure_db(self):
        if self.db is None:
            self.db = KeyFrameDatabase(
                self.voc,
                self.cfg.capacity.max_keyframes,
                self.kp_cap,
            )

    def _transform_kf(self, kf: int):
        """Descriptor tree descent + device BoW aggregation for one KF —
        everything stays on device (reference: Frame::ComputeBoW)."""
        fb = vocab_mod.transform(
            self.voc,
            jnp.asarray(self.map.kf_desc[kf]),
            jnp.asarray(self.map.kf_kp_valid[kf]),
        )
        w, wt = aggregate_bow_dev(fb.word, fb.weight, self.kp_cap)
        return fb, w, wt

    def _index_keyframe(self, kf: int):
        """Transform descriptors -> (word, node); add BoW vector to the DB
        (reference: ComputeBoW + KeyFrameDatabase::add). Fetch-free: node
        table and database rows are device-resident."""
        self._ensure_db()
        fb, w, wt = self._transform_kf(kf)
        self.kf_node_dev = _set_row(self.kf_node_dev, jnp.int32(kf), fb.node)
        self.db.add_dev(kf, w, wt)

    # ------------------------------------------------------------------
    def reloc_candidates(self, desc: np.ndarray, d_valid: np.ndarray) -> list[int]:
        """BoW relocalization candidates for a (lost) frame (reference:
        KeyFrameDatabase::DetectRelocalizationCandidates via
        Tracking::Relocalization, Tracking.cc:1355)."""
        if self.voc is None or self.db is None:
            return []
        fb = vocab_mod.transform(
            self.voc, jnp.asarray(desc), jnp.asarray(d_valid)
        )
        bow = aggregate_bow(fb, self.kp_cap)
        return self.db.detect_reloc_candidates(bow, self.map)

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int) -> bool:
        """Feed one new keyframe to the loop pipeline: apply any pending
        detection first, then dispatch this keyframe's BoW scoring
        (prefetched; the detection logic runs on a later step()). Returns
        True when the pending apply closed a loop. The reference does the
        same work on its LoopClosing thread (LoopClosing.cc:57-88); here
        the stage is split so its device readback crosses a frame boundary
        and costs ~0 (see utils/host.prefetch)."""
        if not self._ensure_vocabulary(kf):
            return False
        if kf in self._pending:
            self._pending.remove(kf)
        # Force-apply any previous detection first: _dispatch overwrites
        # the pending slot.
        closed = self.step(force=True)
        self._dispatch(kf)
        return closed

    def step(self, force: bool = False) -> bool:
        """Apply the pending detection, if any (called once per frame by
        System inside the tracking readback window). Defers (bounded)
        while the scoring readback is still in flight so the frame loop
        never blocks on loop-rate work."""
        pd = self._pending_detect
        if pd is None:
            return False
        if self._defer_detect and not force and not pd[-1].done():
            w_ = getattr(self, "_step_waits", 0)
            if w_ < 5:
                self._step_waits = w_ + 1
                return False
        self._step_waits = 0
        self._pending_detect = None
        kf, connected, node, w, wt, fut = pd
        # Index AFTER scoring (the query must not match itself; the
        # reference adds to the inverted file after DetectLoop,
        # LoopClosing.cc:85,228).
        self.kf_node_dev = _set_row(self.kf_node_dev, jnp.int32(kf), node)
        self.db.add_dev(kf, w, wt)
        score, n_shared = fut.result()
        candidates = self._detect_from(kf, connected, score, n_shared)
        if not candidates:
            return False
        found = self._compute_sim3(kf, candidates)
        if found is None:
            return False
        loop_kf, S_cl, matched_pts = found
        _dbg(f"loop accepted: kf {kf} <-> {loop_kf}")
        self._correct_loop(kf, loop_kf, S_cl, matched_pts)
        self.last_loop_kf = kf
        self.last_loop_serial = int(self.map.kf_serial[kf])
        self.n_loops_closed += 1
        self.map.big_change_idx += 1
        return True

    def advance_background(self):
        """Advance the in-flight background global BA by exactly ONE
        chunk. Called once per tracked frame by the System — NOT from
        step(), which keyframe events may invoke several times per frame
        (a catch-up drain would otherwise run the whole solve inside one
        frame)."""
        return self._advance_gba()

    def drain(self):
        closed = self.step(force=True)
        # Finish any background global BA synchronously (save_map,
        # shutdown, trajectory export need the settled map).
        while self.gba_job is not None:
            self._advance_gba(force=True)
        return closed

    def _dispatch(self, kf: int):
        self._ensure_db()
        connected = self.map.covisible_keyframes(kf, n=1000, min_weight=1)
        fb, w, wt = self._transform_kf(kf)
        # Score ALL keyframes (the covisible scores define minScore); the
        # covisible set is excluded from candidacy at apply time.
        score, n_shared = self.db.scores_dev(w, wt)
        fut = fetch_async(score, n_shared)
        self._pending_detect = (kf, connected, fb.node, w, wt, fut)

    # ------------------------------------------------------------------
    def _detect_from(
        self, kf: int, connected, score: np.ndarray, n_shared: np.ndarray
    ) -> list[int]:
        """Reference: LoopClosing::DetectLoop (:103-229)."""
        # Dead time compares insertion serials, not slot ids (slots are
        # recycled at capacity).
        if self.map.kf_serial[kf] < self.last_loop_serial + self.cfg.loop.min_kf_gap or (
            len(self.map.live_keyframes()) < self.cfg.loop.min_kf_gap
        ):
            self.consistent_groups = []
            return []
        # minScore: lowest BoW similarity among covisible KFs (:121-138).
        cov_scores = [score[c] for c in connected if self.db.valid[c] and score[c] >= 0]
        min_score = min(cov_scores) if cov_scores else 0.015

        # Candidacy excludes the covisible neighborhood + self (the
        # reference's inverted file skips connected KFs, :93-96) and any
        # keyframe within the temporal dead-band (see
        # LoopConfig.candidate_kf_gap).
        score_f = score.copy()
        n_f = n_shared.copy()
        for c in set(connected) | {kf}:
            if 0 <= c < len(score_f):
                score_f[c] = -1.0
                n_f[c] = 0
        recent = (
            self.map.kf_serial
            > self.map.kf_serial[kf] - self.cfg.loop.candidate_kf_gap
        )
        score_f[recent] = -1.0
        n_f[recent] = 0
        cands = self.db.detect_loop_candidates_from(
            score_f, n_f, float(min_score), self.map
        )
        _dbg(
            f"detect kf={kf} serial={self.map.kf_serial[kf]}"
            f" connected={len(connected)} min_score={min_score:.4f}"
            f" cands={cands}"
        )
        if not cands:
            self.consistent_groups = []
            return []

        # Consecutive-consistency accumulation (:152-211).
        enough: list[int] = []
        new_groups: list[tuple[set, int]] = []
        for c in cands:
            group = set([c]) | set(self.map.covisible_keyframes(c, n=1000, min_weight=1))
            best_count = 0
            for prev_set, prev_count in self.consistent_groups:
                if group & prev_set:
                    best_count = max(best_count, prev_count + 1)
            new_groups.append((group, best_count))
            if best_count >= self.cfg.loop.covisibility_consistency_th:
                enough.append(c)
        _dbg(
            "consistency:",
            [(c, n) for (c, (_, n)) in zip(cands, new_groups)],
        )
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------
    def _match_by_bow(self, kf1: int, kf2: int):
        """Descriptor match between two keyframes' map-point features,
        gated by vocabulary-node agreement (reference: SearchByBoW(KF,KF)
        ORBmatcher.cc:522-655 iterates node-aligned FeatureVectors)."""
        mp1 = self.map.kf_mp[kf1]
        mp2 = self.map.kf_mp[kf2]
        ok1 = (mp1 >= 0) & self.map.kf_kp_valid[kf1]
        ok2 = (mp2 >= 0) & self.map.kf_kp_valid[kf2]
        n1 = self.kf_node_dev[kf1]
        n2 = self.kf_node_dev[kf2]
        node_gate = n1[:, None] == n2[None, :]
        m = match.match(
            jnp.asarray(self.map.kf_desc[kf1]),
            jnp.asarray(self.map.kf_desc[kf2]),
            jnp.asarray(ok1), jnp.asarray(ok2),
            pair_mask=node_gate,
            max_dist=self.cfg.matcher.th_low,
            nn_ratio=0.75,
        )
        keep = np.asarray(
            match.rotation_consistency(
                jnp.asarray(self.map.kf_angle[kf1]),
                jnp.asarray(self.map.kf_angle[kf2])[m.idx],
                m.valid,
            )
        )
        return np.asarray(m.idx), keep

    def _compute_sim3(self, kf: int, candidates: list[int]):
        """Reference: LoopClosing::ComputeSim3 (:231-400)."""
        for cand in candidates:
            idx2, keep = self._match_by_bow(kf, cand)
            n = int(keep.sum())
            if n < self.cfg.loop.min_bow_matches:
                _dbg(f"cand {cand}: bow={n} < {self.cfg.loop.min_bow_matches}, reject")
                continue

            # Paired 3D points in each camera frame, padded to a pow2
            # bucket (per-event match counts otherwise compile a fresh
            # RANSAC + Sim3-GN program per loop event).
            feats1 = np.nonzero(keep)[0]
            M = len(feats1)
            MP = max(32, 1 << (M - 1).bit_length())
            f1_p = np.zeros(MP, np.int64)
            f1_p[:M] = feats1
            f2_p = np.zeros(MP, np.int64)
            f2_p[:M] = idx2[feats1]
            mask = np.zeros(MP, bool)
            mask[:M] = True
            p1_ids = self.map.kf_mp[kf, f1_p]
            p2_ids = self.map.kf_mp[cand, f2_p]
            p1_ids, p2_ids = np.maximum(p1_ids, 0), np.maximum(p2_ids, 0)
            T1 = jnp.asarray(self.map.kf_pose[kf])
            T2 = jnp.asarray(self.map.kf_pose[cand])
            x1 = np.asarray(se3.apply(T1, jnp.asarray(self.map.pt_xyz[p1_ids])))
            x2 = np.asarray(se3.apply(T2, jnp.asarray(self.map.pt_xyz[p2_ids])))
            uv1 = self.map.kf_xy[kf, f1_p]
            uv2 = self.map.kf_xy[cand, f2_p]
            # Per-match chi2 gates 9.21*sigma2(octave) (Sim3Solver.cc:106).
            s1 = 9.21 * self.sigma2[self.map.kf_octave[kf, f1_p]]
            s2 = 9.21 * self.sigma2[self.map.kf_octave[cand, f2_p]]

            res = sim3solve.solve_sim3_ransac(
                jnp.asarray(x1), jnp.asarray(x2),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(mask),
                jnp.asarray(s1), jnp.asarray(s2),
                self.K, self.K, self._next_key(),
                fix_scale=self.fix_scale,
                n_hypotheses=self.cfg.loop.sim3_ransac_iters,
                min_inliers=self.cfg.loop.min_sim3_inliers,
            )
            if not bool(res.ok):
                continue

            opt = sim3_opt.optimize_sim3(
                res.S12,
                jnp.asarray(x1), jnp.asarray(x2),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(1.0 / self.sigma2[self.map.kf_octave[kf, f1_p]]),
                jnp.asarray(1.0 / self.sigma2[self.map.kf_octave[cand, f2_p]]),
                res.inliers & jnp.asarray(mask),
                self.K, self.K,
                fix_scale=self.fix_scale,
            )
            if int(opt.n_inliers) < self.cfg.loop.min_sim3_inliers:
                continue

            # Projection widening: all points seen by cand + its covisibles,
            # projected into kf through S12 (reference :335-391).
            S_cl = opt.S12  # maps cand-camera coords -> current-camera coords
            total = self._count_total_matches(kf, cand, S_cl)
            _dbg(
                f"cand {cand}: bow={n} ransac={int(res.n_inliers)}"
                f" opt={int(opt.n_inliers)} total={total}"
            )
            if total >= self.cfg.loop.min_total_matches:
                loop_pts = self._loop_neighborhood_points(cand)
                return cand, S_cl, loop_pts
        return None

    def _loop_neighborhood_points(self, cand: int) -> np.ndarray:
        pts = set()
        for k in [cand] + self.map.covisible_keyframes(cand, n=10):
            mp = self.map.kf_mp[k]
            pts.update(mp[mp >= 0].tolist())
        pts = np.asarray(sorted(pts), np.int64)
        return pts[self.map.pt_valid[pts]] if len(pts) else pts

    @staticmethod
    def _pad_pts(pts: np.ndarray):
        """(padded_idx, real_mask) at a pow2 bucket — per-event point
        counts otherwise compile a fresh projection-match program per
        loop event."""
        n = max(int(len(pts)), 1)
        cap = 1 << (n - 1).bit_length()
        out = np.zeros(cap, np.int64)
        out[: len(pts)] = pts
        mask = np.zeros(cap, bool)
        mask[: len(pts)] = True
        return out, mask

    def _count_total_matches(self, kf: int, cand: int, S_cl) -> int:
        """Project the loop neighborhood into the current KF and count
        guided matches (reference: SearchByProjection(KF, Scw, ...)
        ORBmatcher.cc:290-403 via LoopClosing.cc:375-391)."""
        pts = self._loop_neighborhood_points(cand)
        if len(pts) == 0:
            return 0
        m, pts = self._project_match(kf, pts, S_cl, cand)
        return int(np.asarray(m.valid).sum())

    def _project_match(self, kf: int, pts: np.ndarray, S_cl, cand: int):
        """Match loop points (world coords) into keyframe kf through the
        corrected camera pose S_cl ∘ T_cand."""
        pts_p, mask = self._pad_pts(pts)
        T_cand = sim3.from_se3(jnp.asarray(self.map.kf_pose[cand]))
        S_cw = sim3.compose(S_cl, T_cand)  # world -> current cam (Sim3)
        xc = sim3.apply(S_cw, jnp.asarray(self.map.pt_xyz[pts_p]))
        uv = camera.project(xc, self.K)
        radii = jnp.full((len(pts_p),), 10.0, jnp.float32)
        m = match.match(
            jnp.asarray(self.map.pt_desc[pts_p]),
            jnp.asarray(self.map.kf_desc[kf]),
            jnp.asarray(xc[:, 2] > 0) & jnp.asarray(mask),
            jnp.asarray(self.map.kf_kp_valid[kf]),
            pair_mask=match.window_mask(uv, radii, jnp.asarray(self.map.kf_xy[kf])),
            max_dist=self.cfg.matcher.th_low,
            nn_ratio=1.0,
        )
        return m, pts_p

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, loop_kf: int, S_cl, loop_pts: np.ndarray):
        """Reference: LoopClosing::CorrectLoop (:402-585)."""
        if self.on_before_correction is not None:
            self.on_before_correction()
        import time as _time
        _t0 = _time.perf_counter()

        def _lap(name):
            nonlocal _t0
            t = _time.perf_counter()
            _dbg(f"correct_loop {name}: {(t - _t0) * 1000:.0f} ms")
            _t0 = t
        mp = self.map
        # Corrected Sim3 pose of the current KF: S_cw = S_cl ∘ S_lw
        # (reference: mg2oScw = gScm * gSmw, LoopClosing.cc:234-239 naming
        # m=matched/loop KF).
        S_lw = sim3.from_se3(jnp.asarray(mp.kf_pose[loop_kf]))
        S_cw_corr = sim3.compose(S_cl, S_lw)
        T_cur_old = mp.kf_pose[kf].copy()

        # Snapshot all poses before mutation (edge measurements use the
        # uncorrected geometry, :447-466 NonCorrectedSim3) — one batched
        # from_se3 over the live set.
        live = mp.live_keyframes()
        live_arr = np.asarray(live, np.int64)
        # Fixed (Nk,) shape: ONE compile for the process lifetime (slicing
        # to the live set compiled a fresh program per map size — ~35 s of
        # remote compile landed on the correction frame on the chip).
        S_all = np.asarray(sim3.from_se3(jnp.asarray(mp.kf_pose)))
        S_before = {int(k): S_all[int(k)] for k in live_arr}

        # Propagate the correction to the current covisibility group and
        # their points (:447-516), fully batched: corrected group poses in
        # one composed sim3 op, point ownership resolved with a
        # first-owner-wins scatter, all points moved in one op (the
        # round-3 version looped per keyframe — ~2.5 s of tiny device
        # calls on a 100-KF group).
        group = [kf] + mp.covisible_keyframes(kf, n=100, min_weight=1)
        garr = np.asarray(group, np.int64)
        G = len(group)
        GP = 128  # fixed pad (group is capped at 101): one compile ever
        g_pad = np.zeros((GP, 8), np.float32)
        g_pad[:, 0] = 1.0  # identity quaternions in the padding
        g_pad[:G] = np.stack([S_before[int(g)] for g in group])
        S_g_old = jnp.asarray(g_pad)
        S_cur_old = jnp.asarray(S_before[kf])
        S_gc = sim3.compose(S_g_old, sim3.inverse(S_cur_old)[None])
        S_g_corr = sim3.compose(S_gc, jnp.asarray(S_cw_corr)[None])
        S_g_corr_np = np.asarray(S_g_corr)[:G]
        corrected: dict[int, jnp.ndarray] = {
            int(g): S_g_corr_np[i] for i, g in enumerate(group)
        }
        # Each live point owned by its FIRST group keyframe (group order =
        # covisibility order, like the sequential loop's first-writer-wins).
        Np = mp.pt_xyz.shape[0]
        owner = np.full(Np, -1, np.int32)
        for i in range(len(group) - 1, -1, -1):
            pg = mp.kf_mp[group[i]]
            owner[pg[pg >= 0]] = i
        sel = np.nonzero(owner >= 0)[0]
        sel = sel[mp.pt_valid[sel]]
        if len(sel):
            # Pad the point axis to a pow2 bucket (stable compile cache
            # across events; padding rows recompute point 0 and are
            # discarded on write-back).
            SP = 1 << (len(sel) - 1).bit_length()
            sel_p = np.zeros(SP, np.int64)
            sel_p[: len(sel)] = sel
            oi = np.zeros(SP, np.int32)
            oi[: len(sel)] = owner[sel]
            x_old = sim3.apply(S_g_old[oi], jnp.asarray(mp.pt_xyz[sel_p]))
            x_new = sim3.apply(sim3.inverse(S_g_corr)[oi], x_old)
            mp.pt_xyz[sel] = np.asarray(x_new)[: len(sel)]
            mp.mark_points_dirty(sel)
        mp.kf_pose[garr] = np.asarray(sim3.to_se3(S_g_corr))[:G]
        mp.mark_kf_pose_dirty(garr)
        _lap("propagate")

        # Fuse: project loop-neighborhood points into each corrected KF and
        # replace duplicates (:518-542 + SearchAndFuse :587-613).
        n_fused = 0
        for g in group:
            m, pts = self._project_match_corrected(g, loop_pts)
            ok = np.asarray(m.valid)
            tgt_feat = np.asarray(m.idx)
            for i in np.nonzero(ok)[0]:
                loop_p = int(pts[i])
                feat = int(tgt_feat[i])
                cur_p = mp.kf_mp[g, feat]
                if cur_p >= 0 and cur_p != loop_p and mp.pt_valid[cur_p]:
                    mp.replace_point(int(cur_p), loop_p)
                    n_fused += 1
                elif cur_p < 0:
                    mp.add_observation(loop_p, g, feat)
        _dbg(f"fused {n_fused} duplicate points")
        _lap("fuse")

        # Refresh covisibility for the group (new loop connections :546-564).
        for g in group:
            mp.update_connections(g)
        _lap("connections")

        # Essential-graph optimization (:567 / Optimizer.cc:781).
        self._optimize_essential_graph(
            kf, loop_kf, S_before, corrected, S_cw_corr
        )
        _lap("essential_graph")
        self.loop_edges.append((loop_kf, kf))

        # Arm the background snapshot-epoch global BA (:579 spawns the
        # GBA thread; a running job is aborted first like :411-423).
        self.gba_job = None
        self._start_gba()
        _lap("start_gba")

        # Let the tracker re-anchor its last pose / velocity.
        if self.on_pose_correction is not None:
            T_cur_new = mp.kf_pose[kf].copy()
            self.on_pose_correction(kf, T_cur_old, T_cur_new)

    def _project_match_corrected(self, g: int, loop_pts: np.ndarray):
        """Guided match of loop points into KF g at its (already corrected)
        SE3 pose."""
        pts_p, mask = self._pad_pts(loop_pts)
        T = jnp.asarray(self.map.kf_pose[g])
        xc = se3.apply(T, jnp.asarray(self.map.pt_xyz[pts_p]))
        uv = camera.project(xc, self.K)
        radii = jnp.full((len(pts_p),), 8.0, jnp.float32)
        m = match.match(
            jnp.asarray(self.map.pt_desc[pts_p]),
            jnp.asarray(self.map.kf_desc[g]),
            jnp.asarray(xc[:, 2] > 0) & jnp.asarray(mask),
            jnp.asarray(self.map.kf_kp_valid[g]),
            pair_mask=match.window_mask(uv, radii, jnp.asarray(self.map.kf_xy[g])),
            max_dist=self.cfg.matcher.th_low,
            nn_ratio=1.0,
        )
        return m, pts_p

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, kf, loop_kf, S_before, corrected, S_cw_corr):
        """Build the fixed-shape Sim3 pose graph and solve it
        (reference: Optimizer::OptimizeEssentialGraph :781-1044).

        Edge assembly is fully vectorized (the round-2/3 version built
        edges in nested Python loops over live x Nk): spanning-tree and
        strong-covisibility pairs come from array ops, measurements from
        ONE batched sim3 compose over the stacked pair list."""
        mp = self.map
        live = mp.live_keyframes()
        Nk = mp.kf_pose.shape[0]
        live_arr = np.asarray(live, np.int64)

        # S_before as a dense (Nk, 8) host array. The caller's snapshot
        # dict holds the pre-correction values; dead slots get identity.
        S_before_arr = np.tile(np.asarray(sim3.identity()), (Nk, 1))
        for k, S in S_before.items():
            S_before_arr[k] = np.asarray(S)

        # --- edge pair assembly (vectorized) ---
        # Spanning tree (:898-923).
        par = mp.spanning_parent[live_arr]
        ok = (par >= 0) & mp.kf_valid[np.maximum(par, 0)]
        span_i, span_j = par[ok].astype(np.int64), live_arr[ok]
        # Prior loop edges (:925-949).
        if self.loop_edges:
            le = np.asarray(self.loop_edges, np.int64)
            ok = mp.kf_valid[le[:, 0]] & mp.kf_valid[le[:, 1]]
            loop_i, loop_j = le[ok, 0], le[ok, 1]
        else:
            loop_i = loop_j = np.zeros(0, np.int64)
        # Strong covisibility edges (:951-982), upper triangle only.
        thr = self.cfg.optimizer.essential_graph_min_weight
        live_mask = np.zeros(Nk, bool)
        live_mask[live_arr] = True
        cov = (mp.covis >= thr) & live_mask[:, None] & live_mask[None, :]
        cov_i, cov_j = np.nonzero(np.triu(cov, 1))

        ei = np.concatenate([[loop_kf], span_i, loop_i, cov_i]).astype(np.int64)
        ej = np.concatenate([[kf], span_j, loop_j, cov_j]).astype(np.int64)
        # Dedup by unordered pair, keeping the FIRST occurrence (the loop
        # edge at index 0 carries a special measurement and must win).
        lo, hi = np.minimum(ei, ej), np.maximum(ei, ej)
        keykeep = np.zeros(len(ei), bool)
        _, first = np.unique(lo * Nk + hi, return_index=True)
        keykeep[first] = True
        keykeep &= ei != ej
        keykeep[0] = True  # the loop edge always survives
        ei, ej = ei[keykeep], ej[keykeep]

        # Measurements: S_ji = S_before[j] ∘ S_before[i]^-1, batched at
        # the SOLVER's pow2 edge bucket (an unpadded compose compiled per
        # edge count — a fresh remote compile every loop event); the loop
        # edge (row 0) instead measures the corrected relative.
        E = len(ei)
        Ep = max(16, 1 << (E - 1).bit_length())
        ei_p = np.zeros(Ep, np.int64)
        ej_p = np.zeros(Ep, np.int64)
        ei_p[:E], ej_p[:E] = ei, ej
        Sj = jnp.asarray(S_before_arr[ej_p], jnp.float32)
        Si = jnp.asarray(S_before_arr[ei_p], jnp.float32)
        meas = np.array(sim3.compose(Sj, sim3.inverse(Si)))
        meas[0] = np.asarray(
            sim3.compose(S_cw_corr, sim3.inverse(jnp.asarray(S_before_arr[loop_kf])))
        )
        meas[E:] = np.asarray(sim3.identity())

        verts = np.tile(np.asarray(sim3.identity()), (Nk, 1))
        v_valid = np.zeros(Nk, bool)
        verts[live_arr] = S_before_arr[live_arr]
        v_valid[live_arr] = True
        for k, S in corrected.items():
            verts[k] = np.asarray(S)
        v_fixed = np.zeros(Nk, bool)
        v_fixed[loop_kf] = True

        # Edge axis already padded to the pow2 bucket above: the problem
        # shape repeats across loop events and optimize_pose_graph
        # compiles once per bucket (padding edges are weight-0,
        # valid=False self-loops at vertex 0).
        problem = pose_graph.PoseGraphProblem(
            vertices=jnp.asarray(verts, jnp.float32),
            v_fixed=jnp.asarray(v_fixed),
            v_valid=jnp.asarray(v_valid),
            edge_i=jnp.asarray(ei_p, jnp.int32),
            edge_j=jnp.asarray(ej_p, jnp.int32),
            edge_Sji=jnp.asarray(meas, jnp.float32),
            edge_weight=jnp.asarray(
                np.concatenate([np.ones(E), np.zeros(Ep - E)]), jnp.float32
            ),
            edge_valid=jnp.asarray([True] * E + [False] * (Ep - E)),
        )
        if len(jax.devices()) > 1:
            # Edge-sharded SPMD solve over the device mesh
            # (parallel/dpose_graph).
            from c_orb_slam_tpu.parallel import dpose_graph

            out = dpose_graph.distributed_pose_graph(
                problem,
                iters=self.cfg.optimizer.essential_graph_its,
                pcg_iters=self.cfg.optimizer.pcg_iters,
                fix_scale=self.fix_scale,
            )
        else:
            out = pose_graph.optimize_pose_graph(
                problem,
                iters=self.cfg.optimizer.essential_graph_its,
                pcg_iters=self.cfg.optimizer.pcg_iters,
                fix_scale=self.fix_scale,
            )
        out_np = np.asarray(out)

        # Remap points via their reference KF's correction (:1013-1043):
        # x' = S_new^-1 ( S_old x ). S_old must match the vertex the solve
        # started from (corrected.get(ref, S_before[ref]) == verts[ref]).
        pts = mp.live_points()
        if len(pts):
            # Pow2 point bucket: stable compile cache across loop events.
            P = len(pts)
            PP = 1 << (P - 1).bit_length()
            pts_p = np.zeros(PP, np.int64)
            pts_p[:P] = pts
            ref = mp.pt_ref_kf[pts_p]
            ref = np.where(
                (ref >= 0) & mp.kf_valid[np.maximum(ref, 0)], ref, live[0]
            )
            S_old = jnp.asarray(verts[ref], jnp.float32)
            S_new = jnp.asarray(out_np[ref], jnp.float32)
            x = jnp.asarray(mp.pt_xyz[pts_p])
            x_cam = sim3.apply(S_old, x)
            x_new = sim3.apply(sim3.inverse(S_new), x_cam)
            mp.pt_xyz[pts] = np.asarray(x_new)[:P]
            mp.mark_points_dirty(pts)

        # Write back SE3 poses (t/s, :991-1010) — one batched conversion
        # at the fixed (Nk,) shape.
        T_all = np.asarray(sim3.to_se3(jnp.asarray(out_np, jnp.float32)))
        mp.kf_pose[live_arr] = T_all[live_arr]
        mp.mark_kf_pose_dirty(live)
        mp.update_points_batch(pts)

    # ------------------------------------------------------------------
    # Global BA — snapshot-epoch background solve (SURVEY.md §7.3).
    #
    # The reference runs GBA in a spawned abortable 4th thread while
    # tracking/mapping continue, then patches keyframes/points born
    # during the solve through the spanning tree
    # (LoopClosing::RunGlobalBundleAdjustment, LoopClosing.cc:645-749).
    # The TPU-native equivalent: the problem is SNAPSHOTTED at loop time
    # (identities pinned by kf_serial/pt_serial — slots recycle), the LM
    # solve is chunked into ONE jitted lm_step per tracked frame (device
    # programs interleave with tracking's, so no frame ever waits out the
    # whole solve), and on completion the result is applied with
    # serial-guarded writes + spanning-tree replay of keyframes born
    # mid-solve.

    def _start_gba(self):
        """Assemble the snapshot problem and arm the background job."""
        mp = self.map
        live = mp.live_keyframes()
        pts = mp.live_points()
        if len(live) < 2 or len(pts) == 0:
            return
        live = np.asarray(live, np.int64)
        pts = np.asarray(pts, np.int64)

        # Vectorized observation assembly (was a per-point Python loop —
        # the mapping.py local-BA assembly pattern, applied globally).
        Mo = mp.pt_obs_kf.shape[1]
        obs_kf_all = mp.pt_obs_kf[pts]  # (P, Mo)
        obs_feat_all = mp.pt_obs_feat[pts]
        kf_slot_of = np.full(mp.kf_pose.shape[0], -1, np.int32)
        kf_slot_of[live] = np.arange(len(live), dtype=np.int32)
        ci = np.where(obs_kf_all >= 0, kf_slot_of[np.maximum(obs_kf_all, 0)], -1)
        keep = ci >= 0
        sel_p, sel_o = np.nonzero(keep)
        O = len(sel_p)
        if O < 10:
            return
        kfs_sel = obs_kf_all[sel_p, sel_o]
        feats_sel = obs_feat_all[sel_p, sel_o]
        # Pad to the next power of two: stable jit cache across loop events.
        O_pad = 1 << (O - 1).bit_length()
        obs_cam = np.zeros(O_pad, np.int32)
        obs_pt = np.zeros(O_pad, np.int32)
        obs_uv = np.zeros((O_pad, 3), np.float32)
        obs_stereo = np.zeros(O_pad, bool)
        obs_isig = np.ones(O_pad, np.float32)
        obs_valid = np.zeros(O_pad, bool)
        obs_cam[:O] = ci[sel_p, sel_o]
        obs_pt[:O] = sel_p
        uv_sel = mp.kf_xy[kfs_sel, feats_sel]
        ur_sel = mp.kf_ur[kfs_sel, feats_sel]
        stereo_sel = ur_sel > 0
        obs_uv[:O, :2] = uv_sel
        obs_uv[:O, 2] = np.where(stereo_sel, ur_sel, 0.0)
        obs_stereo[:O] = stereo_sel
        obs_isig[:O] = 1.0 / self.sigma2[mp.kf_octave[kfs_sel, feats_sel]]
        obs_valid[:O] = True

        # Gauge: fix the OLDEST keyframe by serial (the reference fixes
        # KF id 0, Optimizer.cc:79; slot 0 may have been recycled).
        # Camera/point axes are padded to pow2 buckets like the obs axis:
        # per-event sizes otherwise compile a fresh lm_step per loop
        # event (a multi-second remote compile on the chip).
        C, P = len(live), len(pts)
        Cp = max(16, 1 << (C - 1).bit_length())
        Pp = max(256, 1 << (P - 1).bit_length())
        cam_T = np.tile(np.eye(3, 4, dtype=np.float32), (Cp, 1, 1))
        cam_T[:C] = mp.kf_pose[live]
        cam_fixed = np.ones(Cp, bool)
        cam_fixed[:C] = False
        cam_fixed[int(np.argmin(mp.kf_serial[live]))] = True
        cam_valid = np.zeros(Cp, bool)
        cam_valid[:C] = True
        pt_xyz = np.zeros((Pp, 3), np.float32)
        pt_xyz[:P] = mp.pt_xyz[pts]
        pt_valid = np.zeros(Pp, bool)
        pt_valid[:P] = True

        up = jax.device_put(
            (cam_T, cam_fixed, cam_valid, pt_xyz, pt_valid,
             obs_cam, obs_pt, obs_uv,
             obs_stereo, obs_isig, obs_valid,
             np.float32(self.cfg.camera.bf))
        )
        problem = ba_mod.BAProblem(
            cam_T=up[0], cam_fixed=up[1],
            cam_valid=up[2],
            points=up[3], point_valid=up[4],
            obs_cam=up[5], obs_pt=up[6], obs_uv=up[7],
            obs_stereo=up[8], obs_inv_sigma2=up[9], obs_valid=up[10],
            K=self.K, bf=up[11],
        )
        problem = ba_mod.sort_by_point(problem)
        # Multi-device: dispatch the map-sharded SPMD solve over the mesh
        # (parallel/sharded_ba — Schur camera system reduce-scattered over
        # ICI). Single device: chunk the LM schedule one iteration per
        # frame so tracking programs interleave on the one chip.
        job_cls = (
            _ShardedGbaJob if len(jax.devices()) > 1 else _GbaJob
        )
        self.gba_job = job_cls(
            problem=problem,
            kfs=live,
            kf_serials=mp.kf_serial[live].copy(),
            pts=pts,
            pt_serials=mp.pt_serial[pts].copy(),
            iters_first=self.cfg.optimizer.global_ba_its,
            iters_second=self.cfg.optimizer.global_ba_its,
            pcg_iters=self.cfg.optimizer.pcg_iters,
            chi2_mono=self.cfg.optimizer.chi2_mono,
            chi2_stereo=self.cfg.optimizer.chi2_stereo,
        )
        self.gba_job.advance()  # dispatch the first chunk now

    def _advance_gba(self, force: bool = False):
        """Called once per tracked frame: push the background solve one
        chunk forward; apply when finished (force blocks out the final
        readback — drain/shutdown only)."""
        job = self.gba_job
        if job is None:
            return False
        job.advance()
        if not job.ready(force):
            return False
        self.gba_job = None
        self.last_gba_kind = job.__class__.__name__
        self._apply_gba(job)
        return True

    def _apply_gba(self, job: "_GbaJob"):
        """Write the snapshot solve back into the (evolved) map:
        serial-guarded pose/point writes + spanning-tree replay for
        keyframes and points born during the solve (reference:
        LoopClosing.cc:665-737)."""
        mp = self.map
        if self.on_before_correction is not None:
            self.on_before_correction()
        cam_T, points = job.result()
        # The snapshot problem may be padded past the snapshot lists
        # (pow2 compile buckets); ids are positional so slice back.
        cam_T = cam_T[: len(job.kfs)]
        points = points[: len(job.pts)]

        # 1. Snapshot keyframes still live under the same identity.
        T_bef: dict[int, np.ndarray] = {}
        T_new: dict[int, np.ndarray] = {}
        for i, k in enumerate(job.kfs):
            k = int(k)
            if mp.kf_valid[k] and mp.kf_serial[k] == job.kf_serials[i]:
                T_bef[k] = mp.kf_pose[k].copy()
                T_new[k] = cam_T[i]

        if not T_new:
            return

        # 2. Replay keyframes born during the solve via the spanning tree
        # (reference :677-715): T_new[child] = T_cur[child] ∘
        # T_bef[parent]^-1 ∘ T_new[parent]. Children are newer than their
        # parents in serial order, so one serial-sorted pass converges;
        # re-parenting edge cases get two extra passes.
        live_now = mp.live_keyframes()
        rest = sorted(
            (k for k in live_now if k not in T_new),
            key=lambda k: mp.kf_serial[k],
        )
        for _ in range(3):
            progressed = False
            for k in rest:
                if k in T_new:
                    continue
                p = int(mp.spanning_parent[k])
                if p in T_new:
                    T_cur = mp.kf_pose[k]
                    rel = np_se3.compose(T_cur, np_se3.inverse(T_bef[p]))
                    T_bef[k] = T_cur.copy()
                    T_new[k] = np_se3.compose(rel, T_new[p])
                    progressed = True
            if not progressed:
                break

        # 3. Points: snapshot points (same identity) take the solved
        # position; points born during the solve move with their
        # reference keyframe's correction: x' = T_new[ref]^-1 T_bef[ref] x
        # (reference :716-736).
        snap_ok = mp.pt_valid[job.pts] & (mp.pt_serial[job.pts] == job.pt_serials)
        snap_pts = job.pts[snap_ok]
        mp.pt_xyz[snap_pts] = points[snap_ok]

        snap_set = np.zeros(mp.pt_xyz.shape[0], bool)
        snap_set[snap_pts] = True
        other = mp.live_points()
        other = other[~snap_set[other]]
        moved = [int(p) for p in other]
        if moved:
            T_bef_arr = np.zeros((mp.kf_pose.shape[0], 3, 4), np.float32)
            T_new_arr = np.zeros_like(T_bef_arr)
            has = np.zeros(mp.kf_pose.shape[0], bool)
            for k in T_new:
                T_bef_arr[k] = T_bef[k]
                T_new_arr[k] = T_new[k]
                has[k] = True
            refs = mp.pt_ref_kf[moved]
            ok = (refs >= 0) & has[np.maximum(refs, 0)]
            sel = np.asarray(moved)[ok]
            if len(sel):
                r = refs[ok]
                x = mp.pt_xyz[sel]
                Rb = T_bef_arr[r, :, :3]
                tb = T_bef_arr[r, :, 3]
                x_cam = np.einsum("nij,nj->ni", Rb, x) + tb
                Rn = T_new_arr[r, :, :3]
                tn = T_new_arr[r, :, 3]
                x_new = np.einsum("nji,nj->ni", Rn, x_cam - tn)
                mp.pt_xyz[sel] = x_new.astype(np.float32)

        # 4. Publish + re-anchor the tracker off the newest corrected KF.
        all_k = np.asarray(sorted(T_new), np.int64)
        for k in all_k:
            mp.kf_pose[k] = T_new[int(k)]
        mp.mark_kf_pose_dirty(all_k)
        mp.mark_points_dirty(mp.live_points())
        mp.big_change_idx += 1
        self.n_gba_applied += 1
        _dbg(
            f"GBA applied: {len(job.kfs)} snap KFs, "
            f"{len(T_new) - len([k for k in job.kfs if int(k) in T_new])} replayed"
        )
        if self.on_pose_correction is not None:
            anchor = int(all_k[np.argmax(mp.kf_serial[all_k])])
            self.on_pose_correction(anchor, T_bef[anchor], T_new[anchor])
