"""Sequential Python oracle transliterating elPrep's exact semantics.

This stands in for the reference binary (no Go toolchain in this image):
it is a line-by-line behavioral port of the relevant reference functions,
used only in tests to validate the TPU reformulations.

- coordinate_less: sam/sam-types.go:425-473 (incl. modFlag :408-420)
- mark_duplicates_oracle: filters/mark-duplicates.go classifyFragment
  :210-254 + classifyPair :329-396, run sequentially (GOMAXPROCS=1
  arrival order), which is the deterministic outcome of the CAS duels.
- unclipped position / phred score: mark-duplicates.go:36-110.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

MULTIPLE = 0x1
UNMAPPED = 0x4
NEXT_UNMAPPED = 0x8
REVERSED = 0x10
NEXT_REVERSED = 0x20
SECONDARY = 0x100
DUPLICATE = 0x400
SUPPLEMENTARY = 0x800


class Read:
    __slots__ = ("qname", "flag", "rname", "pos", "mapq", "cigar", "rnext",
                 "pnext", "tlen", "qual", "refid", "next_refid", "libid",
                 "upos", "score", "index")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def reads_from_batch(batch, header) -> List[Read]:
    """Build oracle reads from a parsed ReadBatch + header."""
    lb_by_rg = {}
    for rg in header.rg:
        if "LB" in rg:
            lb_by_rg[rg["ID"].encode()] = rg["LB"]
    rg_vals = batch.tags.extract_z(b"RG")
    sq_index = {e["SN"].encode(): i for i, e in enumerate(header.sq)}
    reads = []
    names = batch.names
    for i in range(len(batch)):
        rname = names[batch.rname_id[i]]
        rnext = names[batch.rnext_id[i]]
        refid = sq_index.get(rname, -1)
        nrefid = refid if rnext == b"=" else sq_index.get(rnext, -1)
        cigar = list(zip(batch.cigar_len.row(i).tolist(),
                         batch.cigar_op.row(i).tobytes().decode()))
        r = Read(
            qname=batch.qname[i],
            flag=int(batch.flag[i]),
            rname=rname,
            pos=int(batch.pos[i]),
            mapq=int(batch.mapq[i]),
            cigar=cigar,
            rnext=rnext,
            pnext=int(batch.pnext[i]),
            tlen=int(batch.tlen[i]),
            qual=batch.qual.row(i).tolist(),
            refid=refid,
            next_refid=nrefid,
            libid=lb_by_rg.get(rg_vals[i]),
            upos=0,
            score=0,
            index=i,
        )
        r.upos = unclipped_position(r)
        r.score = phred_score(r)
        reads.append(r)
    return reads


def mod_flag(flag: int) -> int:
    if flag & MULTIPLE == 0:
        flag &= ~NEXT_UNMAPPED
        flag &= ~NEXT_REVERSED
    if flag & UNMAPPED:
        flag &= ~REVERSED
    if flag & NEXT_UNMAPPED:
        flag &= ~NEXT_REVERSED
    return flag


def coordinate_less(a: Read, b: Read) -> bool:
    """(reference: sam/sam-types.go:425-473)"""
    if a.refid < b.refid:
        return a.refid >= 0
    if b.refid < a.refid:
        return b.refid < 0
    if a.pos != b.pos:
        return a.pos < b.pos
    arev, brev = a.flag & REVERSED != 0, b.flag & REVERSED != 0
    if arev != brev:
        return not arev
    if a.qname != b"" and b.qname != b"":
        if a.qname < b.qname:
            return True
        if a.qname > b.qname:
            return False
    f1, f2 = mod_flag(a.flag), mod_flag(b.flag)
    if f1 != f2:
        return f1 < f2
    if a.mapq != b.mapq:
        return a.mapq < b.mapq
    if (a.flag & MULTIPLE) and (b.flag & MULTIPLE):
        if a.next_refid != b.next_refid:
            return a.next_refid < b.next_refid
        if a.pnext != b.pnext:
            return a.pnext < b.pnext
    return a.tlen < b.tlen


def coordinate_sort(reads: List[Read]) -> List[Read]:
    return sorted(reads, key=functools.cmp_to_key(
        lambda x, y: -1 if coordinate_less(x, y) else (1 if coordinate_less(y, x) else 0)
    ))


def phred_score(r: Read) -> int:
    """(reference: mark-duplicates.go:36-68)"""
    score = 0
    for q in r.qual:
        if q > 126 - 33:
            raise ValueError("invalid QUAL")
        if q >= 15:
            score += q
    return score


def unclipped_position(r: Read) -> int:
    """(reference: mark-duplicates.go:79-110)"""
    result = r.pos
    if not r.cigar:
        return result
    clipped_table = {"S": 1, "H": 1}
    ref_table = {"M": 1, "D": 1, "N": 1, "=": 1, "X": 1}
    if r.flag & REVERSED:
        clipped = 1
        result -= 1
        for length, op in reversed(r.cigar):
            c = clipped_table.get(op, 0)
            rr = ref_table.get(op, 0)
            clipped *= c
            result += (rr | clipped) * length
    else:
        for length, op in r.cigar:
            if clipped_table.get(op, 0) == 0:
                break
            result -= length
    return result


def is_true_fragment(r: Read) -> bool:
    return (r.flag & (MULTIPLE | NEXT_UNMAPPED)) != MULTIPLE


def is_true_pair(r: Read) -> bool:
    return (r.flag & (MULTIPLE | NEXT_UNMAPPED)) == MULTIPLE


def mark_duplicates_oracle(reads: List[Read]) -> List[bool]:
    """Sequential emulation of the CAS-based concurrent algorithm
    (reference: mark-duplicates.go:210-254, 329-396)."""
    dup = [False] * len(reads)
    fragments: Dict = {}
    pairs_fragments: Dict = {}
    pairs: Dict = {}

    for i, r in enumerate(reads):
        if r.flag & (UNMAPPED | SECONDARY | SUPPLEMENTARY):
            continue
        # classifyFragment
        key = (r.libid, r.refid, r.upos, (r.flag & REVERSED) != 0)
        if key not in fragments:
            fragments[key] = i
        else:
            best = fragments[key]
            if is_true_fragment(r):
                if is_true_pair(reads[best]):
                    dup[i] = True
                elif reads[best].score > r.score:
                    dup[i] = True
                elif reads[best].score == r.score:
                    if r.qname > reads[best].qname:
                        dup[i] = True
                    else:
                        dup[best] = True
                        fragments[key] = i
                else:
                    dup[best] = True
                    fragments[key] = i
            else:
                if not is_true_pair(reads[best]):
                    dup[best] = True
                    fragments[key] = i

        # classifyPair
        if not is_true_pair(r):
            continue
        pkey = (r.libid, r.qname)
        if pkey in pairs_fragments:
            j = pairs_fragments.pop(pkey)
            aln1, aln2 = i, j
        else:
            pairs_fragments[pkey] = i
            continue
        score = reads[aln1].score + reads[aln2].score
        a1, a2 = reads[aln1], reads[aln2]
        if a1.refid > a2.refid or (
            a1.refid == a2.refid
            and (a1.upos > a2.upos
                 or (a1.upos == a2.upos and (a1.flag & REVERSED) and not (a2.flag & REVERSED)))
        ):
            aln1, aln2 = aln2, aln1
            a1, a2 = a2, a1
        key2 = (
            a1.libid, a1.refid, a2.refid,
            (a1.upos << 32) + (a2.upos & 0xFFFFFFFF),
            (a1.flag & REVERSED) != 0, (a2.flag & REVERSED) != 0,
        )
        if key2 not in pairs:
            pairs[key2] = (score, aln1, aln2)
            continue
        bscore, b1, b2 = pairs[key2]
        if bscore > score:
            dup[aln1] = dup[aln2] = True
        elif bscore == score:
            if reads[aln1].qname > reads[b1].qname:
                dup[aln1] = dup[aln2] = True
            else:
                dup[b1] = dup[b2] = True
                pairs[key2] = (score, aln1, aln2)
        else:
            dup[b1] = dup[b2] = True
            pairs[key2] = (score, aln1, aln2)
    return dup
