"""Independent transcription of the pycocotools COCOeval bbox protocol.

pycocotools cannot be installed in this container (no egress), so this
module is the external pin for ``egtr_tpu/evaluation/coco_map.py``: a
straight numpy re-expression of the published COCOeval algorithm
(cocoeval.py: computeIoU -> evaluateImg -> accumulate -> summarize),
following the reference implementation's data model (flat annotation
lists with ids, xywh boxes, per-annotation area) rather than CocoMAP's
per-image dict model — so the two codebases share no structure, only the
protocol. Agreement on randomized adversarial scenarios then pins the
protocol itself (VERDICT r2 next #3; reference consumer:
/root/reference/lib/evaluation/coco_eval.py:216-264).

Deliberately kept as literal as possible, including the quirks:
- detections truncated to maxDets[-1] at IoU time, then to maxDet at
  evaluateImg time; all sorts are stable ('mergesort');
- crowd gt IoU uses det area as the union and may match many dets;
- the greedy loop's early break when the best match so far is a real gt
  and the remaining candidates are ignored ones;
- unmatched detections outside the area range are ignored, matched ones
  inherit their gt's ignore flag;
- 101-point interpolated precision via right-max envelope + searchsorted.
"""

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
AREA_RNGS = [(0.0, 1e10), (0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2),
             (96.0 ** 2, 1e10)]
MAX_DETS = [1, 10, 100]


def _iou(dts, gts, iscrowd):
    """maskUtils.iou for bbox: xywh boxes, crowd union = det area."""
    D, G = len(dts), len(gts)
    out = np.zeros((D, G))
    for di, d in enumerate(dts):
        dx, dy, dw, dh = d
        da = dw * dh
        for gi, g in enumerate(gts):
            gx, gy, gw, gh = g
            ga = gw * gh
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[gi] else da + ga - inter
            out[di, gi] = inter / union
    return out


class COCOevalTranscription:
    """gts/dts: lists of {'id', 'image_id', 'category_id', 'bbox' (xywh),
    'area', 'iscrowd'} (+ 'score' for dts) — the pycocotools data model."""

    def __init__(self, gts, dts, img_ids, cat_ids):
        self.img_ids = list(img_ids)
        self.cat_ids = list(cat_ids)
        self._gts = {}
        self._dts = {}
        for g in gts:
            g = dict(g)
            g["ignore"] = g.get("ignore", 0) or g["iscrowd"]
            self._gts.setdefault((g["image_id"], g["category_id"]),
                                 []).append(g)
        for d in dts:
            self._dts.setdefault((d["image_id"], d["category_id"]),
                                 []).append(dict(d))

    def _compute_iou(self, img, cat):
        gt = self._gts.get((img, cat), [])
        dt = self._dts.get((img, cat), [])
        if not gt and not dt:
            return np.zeros((0, 0))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > MAX_DETS[-1]:
            dt = dt[: MAX_DETS[-1]]
        return _iou([d["bbox"] for d in dt], [g["bbox"] for g in gt],
                    [int(g["iscrowd"]) for g in gt])

    def _evaluate_img(self, img, cat, a_rng, max_det, ious):
        gt = self._gts.get((img, cat), [])
        dt = self._dts.get((img, cat), [])
        if not gt and not dt:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < a_rng[0]
                                 or g["area"] > a_rng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:max_det]]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        ious_ = ious[:, gtind][: len(dt)] if len(ious) > 0 else ious

        T = len(IOU_THRS)
        G, D = len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((T, D))
        if len(ious_) != 0:
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if ious_[dind, gind] < iou:
                            continue
                        iou = ious_[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                      for d in dt]).reshape((1, len(dt)))
        dt_ig = np.logical_or(dt_ig, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtIds": [d["id"] for d in dt],
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gt_ig,
            "dtIgnore": dt_ig,
        }

    def evaluate_and_summarize(self):
        ious = {(img, cat): self._compute_iou(img, cat)
                for img in self.img_ids for cat in self.cat_ids}
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cat_ids), len(AREA_RNGS), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k, cat in enumerate(self.cat_ids):
            for a, a_rng in enumerate(AREA_RNGS):
                for m, max_det in enumerate(MAX_DETS):
                    E = [self._evaluate_img(img, cat, a_rng, max_det,
                                            ious[(img, cat)])
                         for img in self.img_ids]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dt_scores = np.concatenate(
                        [e["dtScores"][:max_det] for e in E])
                    inds = np.argsort(-dt_scores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, :max_det] for e in E],
                        axis=1)[:, inds]
                    dt_ig = np.concatenate(
                        [e["dtIgnore"][:, :max_det] for e in E],
                        axis=1)[:, inds]
                    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gt_ig == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dt_ig))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, REC_THRS, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)

        def _summ(ap, iou_thr, a_idx, max_det):
            mi = MAX_DETS.index(max_det)
            if ap:
                s = precision[:, :, :, a_idx, mi]
                if iou_thr is not None:
                    ti = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                    s = s[ti]
            else:
                s = recall[:, :, a_idx, mi]
                if iou_thr is not None:
                    ti = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                    s = s[ti]
            vals = s[s > -1]
            return float(np.mean(vals)) if len(vals) else -1.0

        return {
            "AP": _summ(True, None, 0, 100),
            "AP50": _summ(True, 0.5, 0, 100),
            "AP75": _summ(True, 0.75, 0, 100),
            "APs": _summ(True, None, 1, 100),
            "APm": _summ(True, None, 2, 100),
            "APl": _summ(True, None, 3, 100),
            "AR@1": _summ(False, None, 0, 1),
            "AR@10": _summ(False, None, 0, 10),
            "AR@100": _summ(False, None, 0, 100),
            "ARs@100": _summ(False, None, 1, 100),
            "ARm@100": _summ(False, None, 2, 100),
            "ARl@100": _summ(False, None, 3, 100),
        }
