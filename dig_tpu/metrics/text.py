"""Word-level recognition metrics.

Parity targets (reference: evaluation_metric/metrics.py):

* id->string decode that stops at EOS and skips UNKNOWN (:19-64),
* case-insensitive alphanumeric normalization before comparison (:14-16),
* word accuracy (:76-81), char-set F-measure (:83-100),
* edit distance — the reference uses the C++ `editdistance` package (:5);
  this is eval-time-only so a pure-Python Levenshtein suffices,
* lexicon-constrained accuracy / edit distance (:103-186),
* CTC collapse decode + accuracy (:205-251),
* multi-label F-measure (evaluation_metric/multi_label_metrics.py:24-65).
"""

from __future__ import annotations

import numpy as np

from dig_tpu.utils.charset import Charset, normalize_text


def decode_batch(ids, charset: Charset):
    """Decode a [N, T] id array into a list of normalized strings."""
    ids = np.asarray(ids)
    return [normalize_text(charset.decode(row)) for row in ids]


def accuracy(pred_ids, target_ids, charset: Charset) -> float:
    preds = decode_batch(pred_ids, charset)
    targs = decode_batch(target_ids, charset)
    return float(sum(p == t for p, t in zip(preds, targs))) / max(len(preds), 1)


def recognition_f_measure(pred_ids, target_ids, charset: Charset) -> float:
    """Character-set F1 averaged over samples."""
    preds = decode_batch(pred_ids, charset)
    targs = decode_batch(target_ids, charset)
    fs = []
    for pred, targ in zip(preds, targs):
        pred_chars, targ_chars = set(pred), set(targ)
        num_right = float(len(pred_chars & targ_chars))
        p = num_right / (len(pred_chars) + 1e-5)
        r = num_right / (len(targ_chars) + 1e-5)
        fs.append(2 * p * r / (p + r + 1e-5))
    return float(sum(fs)) / max(len(fs), 1)


def levenshtein(a: str, b: str) -> int:
    """Pure-Python/numpy Levenshtein distance (replaces the C++
    `editdistance` dependency; eval-time only, not hot)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(cur[j - 1] + 1, prev[j] + 1, prev[j - 1] + (cb != ca)))
        prev = cur
    return int(prev[-1])


def edit_distance(pred_ids, target_ids, charset: Charset) -> int:
    preds = decode_batch(pred_ids, charset)
    targs = decode_batch(target_ids, charset)
    return int(sum(levenshtein(p, t) for p, t in zip(preds, targs)))


def lexicon_search(lexicon, word: str) -> str:
    """Nearest lexicon entry by edit distance over normalized strings
    (reference: evaluation_metric/metrics.py:67-73)."""
    dists = [levenshtein(normalize_text(w), normalize_text(word)) for w in lexicon]
    return lexicon[int(np.argmin(np.asarray(dists)))]


def accuracy_with_lexicon(pred_ids, target_ids, charset: Charset, lexicons) -> list:
    """Returns [acc_no_lexicon, acc_lexicon...] for each provided lexicon list."""
    preds = decode_batch(pred_ids, charset)
    targs = decode_batch(target_ids, charset)
    accs = [float(sum(p == t for p, t in zip(preds, targs))) / max(len(preds), 1)]
    for lex_per_sample in lexicons:
        refined = [
            normalize_text(lexicon_search(lex, p)) if lex else p
            for lex, p in zip(lex_per_sample, preds)
        ]
        accs.append(
            float(sum(p == t for p, t in zip(refined, targs))) / max(len(preds), 1)
        )
    return accs


def rec_post_process(pred_ids, target_ids, scores, charset: Charset):
    """Decode plus per-word confidence: product of per-step max-probs up to
    and including EOS (reference: evaluation_metric/metrics.py:189-202).
    `scores` is [N, T] of per-step chosen-symbol probabilities.

    Reference-parity caveat: the step count is ``len(pred) + 1`` of the
    NORMALIZED (lowercase alphanumeric) string — exactly what the
    reference computes via get_str_list — so predictions containing
    symbols contribute fewer probability factors than decode steps taken.
    `cli/run_predict.py` computes its confidence from raw step
    probabilities instead; this function exists for metric parity."""
    preds = decode_batch(pred_ids, charset)
    targs = decode_batch(target_ids, charset)
    scores = np.asarray(scores)
    max_len = scores.shape[1]
    out_scores = []
    for i, pred in enumerate(preds):
        n = min(len(pred) + 1, max_len)  # include the EOS step
        out_scores.append(float(np.prod(scores[i, :n])))
    return preds, targs, out_scores


def ctc_decode_batch(ids, charset: Charset):
    """Collapse repeats then drop blanks (blank id == num_classes, one past
    vocab; reference: evaluation_metric/metrics.py:205-227)."""
    ids = np.asarray(ids)
    blank = charset.num_classes
    out = []
    for row in ids:
        chars = []
        prev = -1
        for i in row:
            i = int(i)
            if i != blank and i != prev:
                if i == charset.eos_id or i in (charset.unknown_id, charset.padding_id):
                    prev = i
                    continue
                if i < charset.num_classes:
                    chars.append(charset.classes[i])
            prev = i
        out.append(normalize_text("".join(chars)))
    return out


def ctc_accuracy(pred_ids, target_ids, charset: Charset) -> float:
    preds = ctc_decode_batch(pred_ids, charset)
    targs = decode_batch(target_ids, charset)
    return float(sum(p == t for p, t in zip(preds, targs))) / max(len(preds), 1)


def multi_label_f_measure(logits, targets, threshold: float = 0.5) -> float:
    """Char-presence F1 from sigmoid logits
    (reference: evaluation_metric/multi_label_metrics.py:24-65)."""
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, dtype=np.float64)))
    pred = probs > threshold
    targ = np.asarray(targets) > 0.5
    tp = float((pred & targ).sum())
    p = tp / (pred.sum() + 1e-5)
    r = tp / (targ.sum() + 1e-5)
    return 2 * p * r / (p + r + 1e-5)


def factory():
    return {
        "accuracy": accuracy,
        "recognition_fmeasure": recognition_f_measure,
        "editdistance": edit_distance,
        "accuracy_with_lexicon": accuracy_with_lexicon,
        "ctc_accuracy": ctc_accuracy,
        "multi_label_fmeasure": multi_label_f_measure,
    }
