"""Google-analogies evaluator: the reference's O(Q*V*D) scalar scan
(reference src/compute-accuracy.c:63-189) as one jitted matmul.

Per question a:b::c:d the reference computes vec = M[b] - M[a] + M[c] over
L2-normalized (optionally re-quantized) rows and takes the argmax dot product
over all rows except a, b, c (3COSADD, top-1).  Here all Q questions become a
(Q, D) matrix, scores are one (Q, D) @ (D, V) matmul on the MXU, and the
a/b/c exclusions are per-row masks.

Reference behaviors preserved:
  * vocabulary uppercased on load; duplicate uppercased words resolve to the
    lowest row (the linear scan finds the first match,
    reference src/compute-accuracy.c:104,140-145)
  * optional truncation to the top `threshold` rows (:86)
  * optional re-quantization of loaded rows with a CLI bitlevel (:106)
  * rows are L2-normalized after quantization (:107-110)
  * questions with any OOV word are skipped but counted (TQ vs TQS,
    :148-157); `</s>` is effectively never OOV-safe — it simply never matches
  * best-distance starts at 0, so a prediction only counts if its score is
    strictly positive (:115,167)
  * semantic = the first 5 sections, syntactic = the rest (:181-183)
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SEMANTIC_SECTIONS = 5  # reference QID <= 5 (src/compute-accuracy.c:181-183)


@dataclass
class AnalogyQuestions:
    """Parsed questions-words.txt."""

    sections: List[str]                    # section names in order
    questions: List[Tuple[int, str, str, str, str]]  # (section_idx, a, b, c, d)


def load_questions(path: str) -> AnalogyQuestions:
    sections: List[str] = []
    questions: List[Tuple[int, str, str, str, str]] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == ":":
                sections.append(parts[1] if len(parts) > 1 else "")
                continue
            if len(parts) != 4:
                continue
            a, b, c, d = (p.upper() for p in parts)
            questions.append((len(sections) - 1, a, b, c, d))
    return AnalogyQuestions(sections=sections, questions=questions)


@dataclass
class AnalogyResult:
    section_names: List[str]
    section_seen: np.ndarray      # int [S] — questions evaluated per section
    section_correct: np.ndarray   # int [S]
    total_questions: int          # TQ — all questions incl. OOV-skipped
    seen_questions: int           # TQS

    @property
    def total_accuracy(self) -> float:
        t = self.section_seen.sum()
        return float(self.section_correct.sum()) / t * 100 if t else 0.0

    def _acc(self, mask) -> float:
        t = self.section_seen[mask].sum()
        return float(self.section_correct[mask].sum()) / t * 100 if t else 0.0

    @property
    def semantic_accuracy(self) -> float:
        m = np.arange(len(self.section_names)) < SEMANTIC_SECTIONS
        return self._acc(m)

    @property
    def syntactic_accuracy(self) -> float:
        m = np.arange(len(self.section_names)) >= SEMANTIC_SECTIONS
        return self._acc(m)

    @property
    def coverage(self) -> float:
        return self.seen_questions / self.total_questions * 100 \
            if self.total_questions else 0.0


import functools

# Tables above this many bytes ship to the device as bf16 (see the comment
# at the use site); module constant so tests can exercise the branch on
# small tables.
_BF16_TABLE_BYTES = 2 << 30


@functools.partial(jax.jit, static_argnums=(2, 3))
def _analogy_scores(Mp: jax.Array, abc: jax.Array,
                    v_block: int, V: int) -> jax.Array:
    """(Q,3) word-row indices -> (Q,) argmax-excluding-abc best row ids and
    best scores.  The vocabulary axis is processed in blocks with a running
    max so peak memory is Q*v_block, not Q*V (a (Q,V) score matrix would be
    tens of GB at the 3.7M-vocab configuration).  Tie-breaking matches the
    reference's first-strictly-greater scan (src/compute-accuracy.c:166-176):
    within a block argmax takes the first max; across blocks an earlier
    block's winner survives ties.

    Mp arrives ZERO-PADDED to a v_block multiple (host-side, rows >= V
    excluded below): an in-jit pad held a second full table on the device,
    which OOMs the chip at the 3.7M x 800d flagship shape where one table
    is 11.8 GB of the 16 GB HBM (round-4 postmortem)."""
    D = Mp.shape[1]
    vec = Mp[abc[:, 1]] - Mp[abc[:, 0]] + Mp[abc[:, 2]]  # [Q, D]
    Q = vec.shape[0]
    nb = Mp.shape[0] // v_block
    # scores/carry stay f32 regardless of the table dtype (the flagship
    # path ships the table bf16; dots accumulate f32 via preferred_element_
    # type below)
    neg = jnp.float32(-jnp.inf)

    def body(carry, i):
        best, besti = carry
        blk = jax.lax.dynamic_slice(Mp, (i * v_block, 0), (v_block, D))
        s = jnp.dot(vec, blk.T, preferred_element_type=jnp.float32)  # [Q, vb]
        gidx = i * v_block + jnp.arange(v_block, dtype=jnp.int32)
        excl = ((gidx[None, :] == abc[:, 0:1]) |
                (gidx[None, :] == abc[:, 1:2]) |
                (gidx[None, :] == abc[:, 2:3]) |
                (gidx[None, :] >= V))
        s = jnp.where(excl, neg, s)
        bi = jnp.argmax(s, axis=1)
        bs = jnp.take_along_axis(s, bi[:, None], axis=1)[:, 0]
        upd = bs > best
        return (jnp.where(upd, bs, best),
                jnp.where(upd, gidx[bi], besti)), None

    init = (jnp.full((Q,), neg), jnp.zeros((Q,), jnp.int32))
    (best_score, best), _ = jax.lax.scan(body, init,
                                         jnp.arange(nb, dtype=jnp.int32))
    return best, best_score


def evaluate_analogies(words: List[str], vectors: np.ndarray,
                       questions: AnalogyQuestions,
                       bitlevel: int = 0,
                       threshold: int = 0,
                       batch_size: int = 4096) -> AnalogyResult:
    """Reference compute_accuracy as a batched device computation."""
    from word2bits_tpu.ops.quantize import quantize_np

    M = np.asarray(vectors, dtype=np.float32)
    if threshold and M.shape[0] > threshold:
        M = M[:threshold]
        words = words[:threshold]

    # uppercase; first (most-frequent) row wins duplicates
    index: Dict[str, int] = {}
    for i, w in enumerate(words):
        uw = w.upper()
        if uw not in index:
            index[uw] = i
    # Canonical row per vocab row: the first row sharing its uppercased word.
    # The reference compares uppercased *strings* (compute-accuracy.c:178), so
    # a prediction landing on a case-duplicate row of the answer is correct.
    canon = np.asarray([index[w.upper()] for w in words], dtype=np.int64)

    # host-side numpy twin: the device round-trip (upload 11.8 GB, quantize,
    # fetch) is pure waste for one elementwise pass at flagship scale
    Mq = quantize_np(M, bitlevel)
    norm = np.sqrt((Mq * Mq).sum(axis=1, keepdims=True))
    with np.errstate(divide="ignore", invalid="ignore"):
        Mn = Mq / norm
    Mn[~np.isfinite(Mn)] = 0.0

    S = len(questions.sections)
    tq = len(questions.questions)

    # resolve all questions to indices; keep only fully-covered ones
    get = index.get
    quads = np.asarray(
        [(sec, get(a, -1), get(b, -1), get(c, -1), get(d, -1))
         for sec, a, b, c, d in questions.questions], dtype=np.int64
    ).reshape(tq, 5)
    covered = (quads[:, 1:] >= 0).all(axis=1) if tq else np.zeros(0, bool)
    res = quads[covered]
    secs = res[:, 0]
    answers = res[:, 4]
    n = res.shape[0]

    ok = np.zeros(n, dtype=bool)
    V_true = Mn.shape[0]
    v_block = min(32768, max(128, ((V_true + 127) // 128) * 128))
    vpad = (-V_true) % v_block
    if vpad:  # zero rows, host-side; excluded in-kernel via gidx >= V
        Mn = np.concatenate([Mn, np.zeros((vpad, Mn.shape[1]), Mn.dtype)])
    dpad = (-Mn.shape[1]) % 128
    if dpad:
        # column-pad to the TPU 128-lane tile host-side: an unpadded-width
        # argument makes XLA relayout the table into a tiled HLO temp — at
        # 3.7M x 800 that temp is 12.4 GB next to the 11 GB argument, the
        # round-4 eval OOM.  Zero columns contribute nothing to the dots.
        Mn = np.concatenate(
            [Mn, np.zeros((Mn.shape[0], dpad), Mn.dtype)], axis=1)
    if Mn.nbytes > _BF16_TABLE_BYTES:
        # user-visible: scores at this scale carry the documented bf16
        # precision trade (ADVICE r4) — make that attributable in logs
        print(f"analogy eval: table {Mn.nbytes / 1e9:.1f} GB > "
              f"{_BF16_TABLE_BYTES / 1e9:.0f} GB — scoring in bfloat16 "
              "(f32 accumulation); see eval/analogy.py",
              file=sys.stderr, flush=True)
        # flagship scale: ship the table bf16.  XLA:TPU converts f32 matmul
        # operands to bf16 for the MXU anyway (it hoisted a full-table
        # 6.2 GB convert temp out of the scan — the second round-4 eval
        # OOM); converting host-side halves the argument too.  Scores
        # still accumulate f32.  Small tables keep f32 end-to-end (exact
        # parity with the reference evaluator is tested there).
        Mn = Mn.astype(jnp.bfloat16)
    Mn_dev = jnp.asarray(Mn)
    for ofs in range(0, n, batch_size):
        m = min(batch_size, n - ofs)
        abc_np = np.zeros((batch_size, 3), np.int32)  # pad: one compile shape
        abc_np[:m] = res[ofs:ofs + m, 1:4]
        best, best_score = _analogy_scores(Mn_dev, jnp.asarray(abc_np),
                                           v_block, V_true)
        best = np.asarray(best)[:m]
        pos = np.asarray(best_score)[:m] > 0.0  # reference bestd starts at 0 (:115)
        ok[ofs:ofs + m] = pos & (canon[best] == answers[ofs:ofs + m])

    seen = np.bincount(secs, minlength=S).astype(np.int64)
    correct = np.bincount(secs[ok], minlength=S).astype(np.int64)

    return AnalogyResult(
        section_names=list(questions.sections),
        section_seen=seen,
        section_correct=correct,
        total_questions=tq,
        seen_questions=int(seen.sum()),
    )


def format_report(result: AnalogyResult) -> str:
    """Reproduce the reference's printf transcript
    (reference src/compute-accuracy.c:119-132,187) so outputs diff cleanly."""
    out: List[str] = []
    cacn = 0
    tacn = 0
    seac = sycn_c = 0
    secn = sycn = 0
    for s, name in enumerate(result.section_names):
        out.append(f"{name}:")
        ccn = int(result.section_correct[s])
        tcn = int(result.section_seen[s])
        cacn += ccn
        tacn += tcn
        if s < SEMANTIC_SECTIONS:
            seac += ccn
            secn += tcn
        else:
            sycn_c += ccn
            sycn += tcn
        tcn_p = tcn if tcn else 1  # reference: if TCN==0 TCN=1
        out.append(f"ACCURACY TOP1: {ccn / tcn_p * 100:.2f} %  ({ccn} / {tcn_p})")
        sem = seac / secn * 100 if secn else float("nan")
        syn = sycn_c / sycn * 100 if sycn else float("nan")
        tot = cacn / tacn * 100 if tacn else float("nan")
        out.append(
            f"Total accuracy: {tot:.2f} %   Semantic accuracy: {sem:.2f} %   "
            f"Syntactic accuracy: {syn:.2f} % ")
    cov = result.coverage
    out.append(
        f"Questions seen / total: {result.seen_questions} "
        f"{result.total_questions}   {cov:.2f} % ")
    return "\n".join(out)
