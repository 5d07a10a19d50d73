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
from c_orb_slam_tpu.geometry import camera, se3, sim3
from c_orb_slam_tpu.ops import match, sim3solve
from c_orb_slam_tpu.optim import ba as ba_mod
from c_orb_slam_tpu.optim import pose_graph, sim3_opt
from c_orb_slam_tpu.slam_map.mapstate import MapState

import os

_DEBUG = bool(os.environ.get("SLAM_DEBUG"))


def _dbg(*args):
    if _DEBUG:
        print("[loop]", *args)


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
        # Set by System so a loop correction also fixes the tracker state.
        self.on_pose_correction = None
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
        if not force and not pd[-1].done():
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

    def drain(self):
        return self.step(force=True)

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
        # reference's inverted file skips connected KFs, :93-96).
        score_f = score.copy()
        n_f = n_shared.copy()
        for c in set(connected) | {kf}:
            if 0 <= c < len(score_f):
                score_f[c] = -1.0
                n_f[c] = 0
        cands = self.db.detect_loop_candidates_from(
            score_f, n_f, float(min_score), self.map
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
                continue

            # Paired 3D points in each camera frame.
            feats1 = np.nonzero(keep)[0]
            feats2 = idx2[feats1]
            p1_ids = self.map.kf_mp[kf, feats1]
            p2_ids = self.map.kf_mp[cand, feats2]
            T1 = jnp.asarray(self.map.kf_pose[kf])
            T2 = jnp.asarray(self.map.kf_pose[cand])
            x1 = np.asarray(se3.apply(T1, jnp.asarray(self.map.pt_xyz[p1_ids])))
            x2 = np.asarray(se3.apply(T2, jnp.asarray(self.map.pt_xyz[p2_ids])))
            uv1 = self.map.kf_xy[kf, feats1]
            uv2 = self.map.kf_xy[cand, feats2]
            # Per-match chi2 gates 9.21*sigma2(octave) (Sim3Solver.cc:106).
            s1 = 9.21 * self.sigma2[self.map.kf_octave[kf, feats1]]
            s2 = 9.21 * self.sigma2[self.map.kf_octave[cand, feats2]]

            M = len(feats1)
            res = sim3solve.solve_sim3_ransac(
                jnp.asarray(x1), jnp.asarray(x2),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.ones(M, bool),
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
                jnp.asarray(1.0 / self.sigma2[self.map.kf_octave[kf, feats1]]),
                jnp.asarray(1.0 / self.sigma2[self.map.kf_octave[cand, feats2]]),
                res.inliers,
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
        T_cand = sim3.from_se3(jnp.asarray(self.map.kf_pose[cand]))
        S_cw = sim3.compose(S_cl, T_cand)  # world -> current cam (Sim3)
        xc = sim3.apply(S_cw, jnp.asarray(self.map.pt_xyz[pts]))
        uv = camera.project(xc, self.K)
        radii = jnp.full((len(pts),), 10.0, jnp.float32)
        m = match.match(
            jnp.asarray(self.map.pt_desc[pts]),
            jnp.asarray(self.map.kf_desc[kf]),
            jnp.asarray(xc[:, 2] > 0),
            jnp.asarray(self.map.kf_kp_valid[kf]),
            pair_mask=match.window_mask(uv, radii, jnp.asarray(self.map.kf_xy[kf])),
            max_dist=self.cfg.matcher.th_low,
            nn_ratio=1.0,
        )
        return m, pts

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, loop_kf: int, S_cl, loop_pts: np.ndarray):
        """Reference: LoopClosing::CorrectLoop (:402-585)."""
        mp = self.map
        # Corrected Sim3 pose of the current KF: S_cw = S_cl ∘ S_lw
        # (reference: mg2oScw = gScm * gSmw, LoopClosing.cc:234-239 naming
        # m=matched/loop KF).
        S_lw = sim3.from_se3(jnp.asarray(mp.kf_pose[loop_kf]))
        S_cw_corr = sim3.compose(S_cl, S_lw)
        T_cur_old = mp.kf_pose[kf].copy()

        # Snapshot all poses before mutation (edge measurements use the
        # uncorrected geometry, :447-466 NonCorrectedSim3).
        live = mp.live_keyframes()
        S_before = {
            k: sim3.from_se3(jnp.asarray(mp.kf_pose[k])) for k in live
        }

        # Propagate the correction to the current covisibility group and
        # their points (:447-516).
        group = [kf] + mp.covisible_keyframes(kf, n=100, min_weight=1)
        corrected: dict[int, jnp.ndarray] = {}
        moved_pts: set[int] = set()
        S_cur_old = S_before[kf]
        for g in group:
            S_g_old = S_before[g]
            S_gc = sim3.compose(S_g_old, sim3.inverse(S_cur_old))
            S_g_corr = sim3.compose(S_gc, S_cw_corr)
            corrected[g] = S_g_corr
            # Move this KF's points: x' = S_corr^-1 (S_old x).
            pts_g = mp.kf_mp[g]
            pts_g = np.unique(pts_g[pts_g >= 0])
            pts_g = pts_g[~np.isin(pts_g, list(moved_pts))] if moved_pts else pts_g
            if len(pts_g):
                x_old = sim3.apply(S_g_old, jnp.asarray(mp.pt_xyz[pts_g]))
                x_new = sim3.apply(sim3.inverse(S_g_corr), x_old)
                mp.pt_xyz[pts_g] = np.asarray(x_new)
                mp.mark_points_dirty(pts_g)
                moved_pts.update(pts_g.tolist())
            mp.kf_pose[g] = np.asarray(sim3.to_se3(S_g_corr))
            mp.mark_kf_pose_dirty([g])

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

        # Refresh covisibility for the group (new loop connections :546-564).
        for g in group:
            mp.update_connections(g)

        # Essential-graph optimization (:567 / Optimizer.cc:781).
        self._optimize_essential_graph(
            kf, loop_kf, S_before, corrected, S_cw_corr
        )
        self.loop_edges.append((loop_kf, kf))

        # Global BA with a bounded budget (:579 RunGlobalBundleAdjustment).
        self._global_ba()

        # Let the tracker re-anchor its last pose / velocity.
        if self.on_pose_correction is not None:
            T_cur_new = mp.kf_pose[kf].copy()
            self.on_pose_correction(kf, T_cur_old, T_cur_new)

    def _project_match_corrected(self, g: int, loop_pts: np.ndarray):
        """Guided match of loop points into KF g at its (already corrected)
        SE3 pose."""
        T = jnp.asarray(self.map.kf_pose[g])
        xc = se3.apply(T, jnp.asarray(self.map.pt_xyz[loop_pts]))
        uv = camera.project(xc, self.K)
        radii = jnp.full((len(loop_pts),), 8.0, jnp.float32)
        m = match.match(
            jnp.asarray(self.map.pt_desc[loop_pts]),
            jnp.asarray(self.map.kf_desc[g]),
            jnp.asarray(xc[:, 2] > 0),
            jnp.asarray(self.map.kf_kp_valid[g]),
            pair_mask=match.window_mask(uv, radii, jnp.asarray(self.map.kf_xy[g])),
            max_dist=self.cfg.matcher.th_low,
            nn_ratio=1.0,
        )
        return m, loop_pts

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, kf, loop_kf, S_before, corrected, S_cw_corr):
        """Build the fixed-shape Sim3 pose graph and solve it
        (reference: Optimizer::OptimizeEssentialGraph :781-1044)."""
        mp = self.map
        live = mp.live_keyframes()
        Nk = mp.kf_pose.shape[0]

        edges: list[tuple[int, int, jnp.ndarray, float]] = []
        seen_pairs: set[tuple[int, int]] = set()

        def add_edge(i, j, meas=None, w=1.0):
            key = (min(i, j), max(i, j))
            if key in seen_pairs or i == j:
                return
            seen_pairs.add(key)
            if meas is None:
                meas = sim3.compose(S_before[j], sim3.inverse(S_before[i]))
            edges.append((i, j, meas, w))

        # Loop edge: measured relative = S_cl (already includes scale).
        add_edge(loop_kf, kf, sim3.compose(S_cw_corr, sim3.inverse(S_before[loop_kf])))
        # Spanning tree (:898-923).
        for k in live:
            p = mp.spanning_parent[k]
            if p >= 0 and mp.kf_valid[p]:
                add_edge(int(p), int(k))
        # Prior loop edges (:925-949).
        for (a, b) in self.loop_edges:
            if mp.kf_valid[a] and mp.kf_valid[b]:
                add_edge(a, b)
        # Strong covisibility edges (:951-982).
        thr = self.cfg.optimizer.essential_graph_min_weight
        for k in live:
            for j in np.nonzero(mp.covis[k] >= thr)[0]:
                if j > k and mp.kf_valid[j]:
                    add_edge(int(k), int(j))

        verts = np.tile(np.asarray(sim3.identity()), (Nk, 1))
        v_valid = np.zeros(Nk, bool)
        for k in live:
            S = corrected.get(k, S_before[k])
            verts[k] = np.asarray(S)
            v_valid[k] = True
        v_fixed = np.zeros(Nk, bool)
        v_fixed[loop_kf] = True

        # Pad the edge axis to a power-of-two bucket: the problem shape then
        # repeats across loop events and optimize_pose_graph compiles once
        # per bucket instead of once per event (padding edges are weight-0,
        # valid=False self-loops at vertex 0).
        E = len(edges)
        Ep = max(16, 1 << (E - 1).bit_length())
        pad = Ep - E
        ident = jnp.asarray(sim3.identity())
        problem = pose_graph.PoseGraphProblem(
            vertices=jnp.asarray(verts, jnp.float32),
            v_fixed=jnp.asarray(v_fixed),
            v_valid=jnp.asarray(v_valid),
            edge_i=jnp.asarray([e[0] for e in edges] + [0] * pad, jnp.int32),
            edge_j=jnp.asarray([e[1] for e in edges] + [0] * pad, jnp.int32),
            edge_Sji=jnp.stack([e[2] for e in edges] + [ident] * pad),
            edge_weight=jnp.asarray(
                [e[3] for e in edges] + [0.0] * pad, jnp.float32
            ),
            edge_valid=jnp.asarray([True] * E + [False] * pad),
        )
        out = pose_graph.optimize_pose_graph(
            problem,
            iters=self.cfg.optimizer.essential_graph_its,
            pcg_iters=self.cfg.optimizer.pcg_iters,
            fix_scale=self.fix_scale,
        )
        out_np = np.asarray(out)

        # Remap points via their reference KF's correction (:1013-1043):
        # x' = S_new^-1 ( S_old x ).
        pts = mp.live_points()
        if len(pts):
            ref = mp.pt_ref_kf[pts]
            ref = np.where((ref >= 0) & mp.kf_valid[np.maximum(ref, 0)], ref, live[0])
            S_old = np.stack([np.asarray(corrected.get(int(r), S_before[int(r)])) for r in ref])
            S_new = out_np[ref]
            x = jnp.asarray(mp.pt_xyz[pts])
            x_cam = jax.vmap(sim3.apply)(jnp.asarray(S_old), x[:, None, :])[:, 0]
            x_new = jax.vmap(sim3.apply)(
                jax.vmap(sim3.inverse)(jnp.asarray(S_new)), x_cam[:, None, :]
            )[:, 0]
            mp.pt_xyz[pts] = np.asarray(x_new)
            mp.mark_points_dirty(pts)

        # Write back SE3 poses (t/s, :991-1010).
        for k in live:
            mp.kf_pose[k] = np.asarray(sim3.to_se3(jnp.asarray(out_np[k])))
        mp.mark_kf_pose_dirty(live)
        for p in pts:
            mp.update_point_descriptor_and_normal(int(p))

    # ------------------------------------------------------------------
    def _global_ba(self):
        """Full-map BA with a bounded iteration budget (reference spawns an
        abortable thread, LoopClosing.cc:645-749; a budget replaces the
        abort flag, SURVEY.md §2.3)."""
        mp = self.map
        live = mp.live_keyframes()
        pts = mp.live_points()
        if len(live) < 2 or len(pts) == 0:
            return
        kf_slot = {int(k): i for i, k in enumerate(live)}
        pt_slot = {int(p): i for i, p in enumerate(pts)}
        obs = []
        for p in pts:
            n = mp.pt_n_obs[p]
            for k, f in zip(mp.pt_obs_kf[p, :n], mp.pt_obs_feat[p, :n]):
                if k < 0 or not mp.kf_valid[k]:
                    continue
                ur = mp.kf_ur[k, f]
                obs.append(
                    (
                        kf_slot[int(k)], pt_slot[int(p)],
                        mp.kf_xy[k, f, 0], mp.kf_xy[k, f, 1],
                        ur if ur > 0 else 0.0,
                        1.0 / self.sigma2[mp.kf_octave[k, f]],
                        1.0 if ur > 0 else 0.0,
                    )
                )
        O = len(obs)
        if O < 10:
            return
        # Pad to the next power of two: stable jit cache across loop events.
        O_pad = 1 << (O - 1).bit_length()
        arr = np.zeros((O_pad, 7), np.float32)
        arr[:O] = np.asarray(obs, np.float32)
        valid = np.zeros(O_pad, bool)
        valid[:O] = True

        problem = ba_mod.BAProblem(
            cam_T=jnp.asarray(mp.kf_pose[live]),
            cam_fixed=jnp.asarray([i == 0 for i in range(len(live))]),
            cam_valid=jnp.ones(len(live), bool),
            points=jnp.asarray(mp.pt_xyz[pts]),
            point_valid=jnp.ones(len(pts), bool),
            obs_cam=jnp.asarray(arr[:, 0], jnp.int32),
            obs_pt=jnp.asarray(arr[:, 1], jnp.int32),
            obs_uv=jnp.asarray(arr[:, 2:5]),
            obs_stereo=jnp.asarray(arr[:, 6] > 0),
            obs_inv_sigma2=jnp.asarray(arr[:, 5]),
            obs_valid=jnp.asarray(valid),
            K=self.K,
            bf=jnp.asarray(float(self.cfg.camera.bf)),
        )
        res = ba_mod.bundle_adjust(
            problem,
            iters_first=self.cfg.optimizer.global_ba_its,
            iters_second=self.cfg.optimizer.global_ba_its,
            pcg_iters=self.cfg.optimizer.pcg_iters,
        )
        mp.kf_pose[live] = np.asarray(res.cam_T)
        mp.pt_xyz[pts] = np.asarray(res.points)
        mp.mark_kf_pose_dirty(live)
        mp.mark_points_dirty(pts)
