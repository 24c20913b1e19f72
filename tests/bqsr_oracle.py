"""Independent sequential BQSR oracle transliterating filters/bqsr.go.

Per-base covariates are computed with the reference's exact rolling-key
and stranded-clipped-seq machinery (bqsr.go:64-146, 312-362), tables as
plain dicts (bqsr.go:180-223), apply with per-base hierarchical Bayesian
estimates and memoization dropped (bqsr.go:901-1006). Only the clipping
functions are shared with the implementation (they have their own unit
tests)."""

from __future__ import annotations

import math
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from elprep_tpu.filters import clipping
from elprep_tpu.io import intervals as iv

LENGTH_BITS = 4
MISMATCH_CTX_SIZE = 2
LOW_QUALITY_TAIL = 2
MIN_INTERESTING_QUAL = 6

_BASE_IDX = {ord(c): i for c, i in zip("AaCcGgTt", [0, 0, 1, 1, 2, 2, 3, 3])}
_BASE_IDX[ord("*")] = 0
_BASE_INT = {}
for c in "aA*":
    _BASE_INT[ord(c)] = 1
for c in "cC":
    _BASE_INT[ord(c)] = 2
for c in "gG":
    _BASE_INT[ord(c)] = 3
for c in "tT":
    _BASE_INT[ord(c)] = 4
_COMPL = {ord("A"): ord("T"), ord("a"): ord("T"), ord("C"): ord("G"), ord("c"): ord("G"),
          ord("G"): ord("C"), ord("g"): ord("C"), ord("T"): ord("A"), ord("t"): ord("A")}


def simple_base_to_index(b: int) -> int:
    return _BASE_IDX.get(b, -1)


def key_from_context(dna: bytes, start: int, end: int) -> int:
    key = end - start
    bit_offset = LENGTH_BITS
    for i in range(start, end):
        bi = simple_base_to_index(dna[i])
        if bi == -1:
            return -1
        key |= bi << bit_offset
        bit_offset += 2
    return key


def create_mask(context_size: int) -> int:
    mask = 0
    for _ in range(context_size):
        mask = (mask << 2) | 3
    return mask << LENGTH_BITS


def context_with(bases: bytes, context_size: int) -> List[int]:
    """(reference: bqsr.go:87-131)"""
    mask = create_mask(context_size)
    read_length = len(bases)
    keys: List[int] = []
    i = 1
    while i < context_size and i <= read_length:
        keys.append(-1)
        i += 1
    if read_length < context_size:
        return keys
    new_base_offset = 2 * (context_size - 1) + LENGTH_BITS
    current_key = key_from_context(bases, 0, context_size)
    keys.append(current_key)
    current_n_penalty = 0
    if current_key == -1:
        current_key = 0
        current_n_penalty = context_size - 1
        offset = new_base_offset
        while bases[current_n_penalty] != ord("N"):
            bi = simple_base_to_index(bases[current_n_penalty])
            current_key |= bi << offset
            offset -= 2
            current_n_penalty -= 1
    for current_index in range(context_size, read_length):
        bi = simple_base_to_index(bases[current_index])
        if bi == -1:
            current_n_penalty = context_size
            current_key = 0
        else:
            current_key = (current_key >> 2) & mask
            current_key |= bi << new_base_offset
            current_key |= context_size
        if current_n_penalty == 0:
            keys.append(current_key)
        else:
            current_n_penalty -= 1
            keys.append(-1)
    return keys


def compute_stranded_clipped_seq(r: clipping.ClipRead) -> Optional[bytes]:
    """(reference: bqsr.go:312-362)"""
    seq = r.seq
    n = len(seq)
    left_pos = n
    for i in range(n):
        if r.qual[i] > LOW_QUALITY_TAIL:
            left_pos = i
            break
    right_pos = left_pos - 1
    for i in range(n - 1, left_pos - 1, -1):
        if r.qual[i] > LOW_QUALITY_TAIL:
            right_pos = i
            break
    if left_pos > right_pos:
        return None
    out = bytearray(n)
    if r.is_reversed():
        j = -1
        for i in range(right_pos + 1, n):
            j += 1
            out[j] = ord("N")
        for i in range(right_pos, left_pos - 1, -1):
            j += 1
            out[j] = _COMPL.get(seq[i], seq[i])
        for i in range(left_pos):
            j += 1
            out[j] = ord("N")
    else:
        for i in range(left_pos):
            out[i] = ord("N")
        for i in range(left_pos, right_pos + 1):
            out[i] = seq[i]
        for i in range(right_pos + 1, n):
            out[i] = ord("N")
    return bytes(out)


def compute_base_context_covariate(r: clipping.ClipRead) -> List[int]:
    scs = compute_stranded_clipped_seq(r)
    if scs is None:
        return []
    keys = context_with(scs, MISMATCH_CTX_SIZE)
    if r.is_reversed():
        keys.reverse()
    return keys


def prepare_cycle_covariates(r: clipping.ClipRead) -> Tuple[int, int]:
    """(reference: bqsr.go:376-386)"""
    reversed_ = (r.flag & 0x10) >> 4
    last = (r.flag & 0x80) >> 7
    read_order_factor = 1 - 2 * last
    cycle_factor = read_order_factor + reversed_ * (len(r.seq) - 1) * read_order_factor
    increment = (1 - 2 * reversed_) * read_order_factor
    return cycle_factor, increment


def compute_snp_events(r: clipping.ClipRead, ref: bytes) -> List[int]:
    """(reference: bqsr.go:254-285)"""
    snps = [0] * len(r.seq)
    i = 0
    j = r.pos - 1
    for ln, op in r.cigar:
        if op in ("M", "=", "X"):
            for _ in range(ln):
                if _BASE_INT.get(r.seq[i], 0) != _BASE_INT.get(ref[j], 0):
                    snps[i] = 1
                i += 1
                j += 1
        elif op in ("D", "N"):
            j += ln
        elif op in ("I", "S"):
            i += ln
    return snps


def calculate_skip_slice(r: clipping.ClipRead, known) -> List[bool]:
    """(reference: bqsr.go:389-414)"""
    n = len(r.seq)
    skip = [False] * n
    if known is None or len(known) == 0:
        return skip
    ss = clipping.soft_start(r)
    se = clipping.soft_end(r)
    for s, e in iv.intersect(known, ss, se):
        fs, ok = clipping.get_read_coordinate_for_reference_coordinate(r.cigar, ss, int(s), clipping.LEFT)
        if not ok or fs < 0:
            fs = 0
        fe, ok = clipping.get_read_coordinate_for_reference_coordinate(r.cigar, ss, int(e), clipping.LEFT)
        if not ok or fe > n - 1:
            fe = n - 1
        for k in range(fs, fe + 1):
            skip[k] = True
    return skip


def rg_covariate(header, rg_val: bytes) -> str:
    for record in header.rg:
        if record.get("ID") == rg_val.decode():
            return record.get("PU", rg_val.decode())
    return rg_val.decode()


def recalibrate_oracle(header, batch, genome: Dict[str, bytes], known: Dict[str, np.ndarray], max_cycle: int):
    """Returns three dicts: qs[(rg,q)] = [obs, mism]; cyc[(rg,q,c)]; ctx[(rg,q,key)]."""
    from elprep_tpu.filters.bqsr import _recalibrate_eligibility

    eligible, rg_vals = _recalibrate_eligibility(header, batch)
    qs: Dict = {}
    cyc: Dict = {}
    ctx: Dict = {}

    def upd(table, key, err):
        if key in table:
            table[key][0] += 1
            table[key][1] += err
        else:
            table[key] = [1, err]

    names = batch.names
    for i in np.flatnonzero(eligible):
        r = clipping.ClipRead(
            flag=int(batch.flag[i]), pos=int(batch.pos[i]), pnext=int(batch.pnext[i]),
            tlen=int(batch.tlen[i]), mapq=int(batch.mapq[i]),
            cigar=list(zip(batch.cigar_len.row(i).tolist(), batch.cigar_op.row(i).tobytes().decode())),
            seq=batch.seq.row(i).tobytes(), qual=batch.qual.row(i).tobytes(),
            rname=names[batch.rname_id[i]], rnext=names[batch.rnext_id[i]],
        )
        clipping.hard_clip_adaptor_sequence(r)
        if len(r.seq) == 0:
            continue
        clipping.hard_clip_soft_clipped_bases(r)
        if len(r.seq) == 0:
            continue
        skip = calculate_skip_slice(r, known.get(r.rname.decode()))
        ref = genome[r.rname.decode()]
        snps = compute_snp_events(r, ref)
        rg = rg_covariate(header, rg_vals[i])
        cycle_factor, cycle_increment = prepare_cycle_covariates(r)
        ctx_cov = compute_base_context_covariate(r)
        for k in range(len(r.seq)):
            if skip[k]:
                continue
            if r.seq[k] not in _BASE_IDX:
                continue
            qual = r.qual[k]
            if qual < MIN_INTERESTING_QUAL:
                continue
            err = snps[k]
            upd(qs, (rg, qual), err)
            cycle = cycle_factor + k * cycle_increment
            if abs(cycle) > max_cycle:
                raise ValueError("cycle value exceeds maximum cycle value")
            upd(cyc, (rg, qual, cycle), err)
            if len(ctx_cov) > 0 and ctx_cov[k] >= 0:
                upd(ctx, (rg, qual, ctx_cov[k]), err)
    return qs, cyc, ctx


# ---------------------------------------------------------------------------
# finalize / apply oracle (scalar, reference: bqsr.go:553-706, 901-1006)
# ---------------------------------------------------------------------------

PRIOR_CACHE = [
    -0.045757490560675115, -0.9143464543671788, -3.5201133457866898,
    -7.863058164819208, -13.943180911464733, -21.760481585723266,
    -31.314960187594806, -42.606616717079355, -55.63545117417691,
    -70.40146355888747, -86.90465387121104, -105.14502211114761,
    -125.1225682786972, -146.83729237385978, -170.2891943966354,
    -195.47827434702398, -222.4045322250256, -251.06796803064023,
    -281.46858176386786, -313.60637342472336, -1.7976931348623157e308,
]


def log10_binomial_probability(n: int, k: int, log10p: float) -> float:
    if log10p == 0.0:
        return -sys.float_info.max
    log10e = math.log10(math.e)
    log10_minp = math.log10(1.0 - 10 ** log10p)
    coeff = (math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)) * log10e
    return coeff + log10p * k + log10_minp * (n - k)


def bayesian_estimate(observations: int, mismatches: int, prior: float) -> int:
    maxnobs = 2**31 - 2
    if observations > maxnobs:
        mismatches = int(math.floor(abs(mismatches * (maxnobs / observations)) + 0.5))
        observations = maxnobs
    best = -sys.float_info.max
    best_i = 0
    for i in range(61):
        diff = min(abs(int(i - prior)), 20)
        p1 = PRIOR_CACHE[diff]
        p2 = log10_binomial_probability(observations, mismatches, i / -10.0) if observations else 0.0
        post = p1 + p2
        if best < post:
            best = post
            best_i = i
    return min(best_i, 93)


def empirical_quality(obs: int, mism: int, prior: float) -> int:
    return bayesian_estimate(obs + 2, mism + 1, prior)


def combined_rg_oracle(qs: Dict) -> Dict[str, Tuple[float, int, int, int]]:
    """initializeCombinedBQSRTable (reference: bqsr.go:655-674), with
    deterministic iteration (the Go map order doesn't change the result
    beyond f64 noise; we sum exactly)."""
    per_rg: Dict[str, List] = {}
    for (rg, q), (obs, mism) in sorted(qs.items()):
        ent = per_rg.setdefault(rg, [0, 0, 0.0])
        ent[0] += obs
        ent[1] += mism
        ent[2] += obs * (10 ** (q / -10.0))
    out = {}
    for rg, (obs, mism, sum_err) in per_rg.items():
        reported = -10 * math.log10(sum_err / obs)
        out[rg] = (reported, empirical_quality(obs, mism, reported), obs, mism)
    return out


def apply_oracle(header, batch, qs, cyc, ctx, max_cycle: int,
                 quant_scores: np.ndarray, sqq_lut: Optional[np.ndarray]) -> List[bytes]:
    """Per-read recalibrated QUALs (reference: bqsr.go:936-1006)."""
    combined = combined_rg_oracle(qs)
    rg_vals = batch.tags.extract_z(b"RG")
    out = []
    for i in range(len(batch)):
        qual = bytearray(batch.qual.row(i).tobytes())
        rg = rg_covariate(header, rg_vals[i])
        if rg not in combined:
            out.append(bytes(qual))
            continue
        reported, rg_eq, rg_obs, rg_mism = combined[rg]
        epsilon = reported
        r = clipping.ClipRead(
            flag=int(batch.flag[i]), pos=int(batch.pos[i]), pnext=int(batch.pnext[i]),
            tlen=int(batch.tlen[i]), mapq=int(batch.mapq[i]),
            cigar=[], seq=batch.seq.row(i).tobytes(), qual=bytes(qual),
        )
        cycle_factor, cycle_increment = prepare_cycle_covariates(r)
        ctx_cov = compute_base_context_covariate(r)
        for k in range(len(r.seq)):
            q = qual[k]
            if q < MIN_INTERESTING_QUAL:
                continue
            delta_global = float(empirical_quality(rg_obs, rg_mism, epsilon)) - epsilon
            e = qs.get((rg, q))
            delta_reported = 0.0
            if e is not None:
                delta_reported = float(empirical_quality(e[0], e[1], delta_global + epsilon)) - delta_global - epsilon
            cond = delta_reported + delta_global + epsilon
            delta_cov = 0.0
            cycle = cycle_factor + k * cycle_increment
            ce = cyc.get((rg, q, cycle))
            if ce is not None:
                delta_cov = float(empirical_quality(ce[0], ce[1], cond)) - cond
            ctxkey = ctx_cov[k] if len(ctx_cov) > 0 else -1
            xe = ctx.get((rg, q, ctxkey))
            if xe is not None:
                delta_cov += float(empirical_quality(xe[0], xe[1], cond)) - cond
            est = cond + delta_cov
            v = int(math.floor(abs(est) + 0.5)) * (1 if est >= 0 else -1)
            idx = max(1, min(v, 93))
            newq = quant_scores[idx]
            if sqq_lut is not None:
                newq = sqq_lut[newq]
            qual[k] = int(newq)
        out.append(bytes(qual))
    return out
