"""Synthetic SAM data generator for tests (deterministic)."""

from __future__ import annotations

import random
from typing import List, Optional


def make_header_lines(contigs, rgs=None, extra=None) -> List[str]:
    lines = ["@HD\tSO:unknown\tVN:1.6"]
    for name, ln in contigs:
        lines.append(f"@SQ\tLN:{ln}\tSN:{name}")
    for rg in rgs or []:
        lines.append("@RG\t" + "\t".join(f"{k}:{v}" for k, v in sorted(rg.items())))
    lines.extend(extra or [])
    return lines


def random_reads(
    n: int,
    contigs,
    seed: int = 42,
    paired_fraction: float = 0.7,
    dup_fraction: float = 0.3,
    read_len: int = 100,
    rg_ids: Optional[List[str]] = None,
) -> List[str]:
    """Generate n alignment lines (possibly paired, with position collisions
    to exercise duplicate marking)."""
    rng = random.Random(seed)
    lines = []
    i = 0
    hot_positions = [
        (rng.randrange(len(contigs)), rng.randrange(1, max(2, contigs[c % len(contigs)][1] - 2 * read_len)))
        for c in range(max(1, int(n * dup_fraction / 4)))
    ]
    while len(lines) < n:
        qname = f"read{i:07d}"
        i += 1
        if rng.random() < dup_fraction and hot_positions:
            ci, pos = hot_positions[rng.randrange(len(hot_positions))]
        else:
            ci = rng.randrange(len(contigs))
            pos = rng.randrange(1, max(2, contigs[ci][1] - 2 * read_len))
        cname = contigs[ci][0]
        seq = "".join(rng.choice("ACGT") for _ in range(read_len))
        qual = "".join(chr(33 + rng.randrange(10, 40)) for _ in range(read_len))
        mapq = rng.randrange(0, 60)
        softclip = rng.choice([0, 0, 0, 5, 10])
        if softclip:
            cigar = f"{softclip}S{read_len - softclip}M"
        else:
            cigar = f"{read_len}M"
        tags = []
        if rg_ids:
            tags.append("RG:Z:" + rng.choice(rg_ids))
        tagstr = ("\t" + "\t".join(tags)) if tags else ""
        if rng.random() < paired_fraction and len(lines) + 2 <= n:
            mpos = pos + rng.randrange(50, 200)
            flag1 = 0x1 | 0x2 | 0x40 | (0x20)
            flag2 = 0x1 | 0x2 | 0x80 | (0x10)
            tlen = mpos + read_len - pos
            lines.append(
                f"{qname}\t{flag1}\t{cname}\t{pos}\t{mapq}\t{cigar}\t=\t{mpos}\t{tlen}\t{seq}\t{qual}{tagstr}"
            )
            seq2 = "".join(rng.choice("ACGT") for _ in range(read_len))
            qual2 = "".join(chr(33 + rng.randrange(10, 40)) for _ in range(read_len))
            lines.append(
                f"{qname}\t{flag2}\t{cname}\t{mpos}\t{mapq}\t{read_len}M\t=\t{pos}\t{-tlen}\t{seq2}\t{qual2}{tagstr}"
            )
        else:
            flag = 0x10 if rng.random() < 0.5 else 0
            if rng.random() < 0.02:
                flag |= 0x4  # unmapped
            lines.append(
                f"{qname}\t{flag}\t{cname}\t{pos}\t{mapq}\t{cigar}\t*\t0\t0\t{seq}\t{qual}{tagstr}"
            )
    return lines[:n]


def make_genome(contigs, seed=99):
    """Random reference genome dict name -> bytes (with some N runs)."""
    rng = random.Random(seed)
    genome = {}
    for name, ln in contigs:
        seq = [rng.choice("ACGT") for _ in range(ln)]
        # sprinkle N runs
        for _ in range(max(1, ln // 5000)):
            p = rng.randrange(ln)
            for k in range(p, min(ln, p + rng.randrange(1, 10))):
                seq[k] = "N"
        genome[name] = "".join(seq).encode()
    return genome


def reads_from_genome(
    n: int,
    contigs,
    genome,
    seed: int = 17,
    read_len: int = 100,
    rg_ids=None,
    mismatch_rate: float = 0.02,
):
    """Paired reads sampled from the genome with mismatches, soft clips,
    indels, and a realistic qual distribution (incl. low-qual tails)."""
    rng = random.Random(seed)
    lines = []
    i = 0

    def make_seq(cname, pos, ln):
        ref = genome[cname][pos - 1 : pos - 1 + ln].decode()
        seq = list(ref)
        for k in range(len(seq)):
            if seq[k] == "N":
                seq[k] = rng.choice("ACGT")
            elif rng.random() < mismatch_rate:
                seq[k] = rng.choice("ACGT")
        return "".join(seq)

    def make_qual(ln):
        q = [rng.randrange(2, 40) for _ in range(ln)]
        # low-qual tails sometimes
        if rng.random() < 0.3:
            for k in range(rng.randrange(1, 5)):
                q[k] = rng.randrange(0, 3)
        if rng.random() < 0.3:
            for k in range(rng.randrange(1, 5)):
                q[-1 - k] = rng.randrange(0, 3)
        return "".join(chr(33 + v) for v in q)

    while len(lines) + 2 <= n:
        qname = f"frag{i:06d}"
        i += 1
        ci = rng.randrange(len(contigs))
        cname, clen = contigs[ci]
        pos = rng.randrange(1, clen - 3 * read_len)
        isize = rng.randrange(read_len + 20, 2 * read_len + 100)
        mpos = pos + isize - read_len
        softclip = rng.choice([0, 0, 0, 5])
        if softclip:
            cigar1 = f"{softclip}S{read_len - softclip}M"
            ln1_ref = read_len - softclip
        else:
            cigar1 = f"{read_len}M"
            ln1_ref = read_len
        seq1 = make_seq(cname, pos, read_len)
        # forward read of the pair
        flag1 = 0x1 | 0x2 | 0x40 | 0x20
        flag2 = 0x1 | 0x2 | 0x80 | 0x10
        tlen = mpos + read_len - pos
        rgtag = ("\tRG:Z:" + rng.choice(rg_ids)) if rg_ids else ""
        mapq = rng.randrange(1, 60)
        lines.append(
            f"{qname}\t{flag1}\t{cname}\t{pos}\t{mapq}\t{cigar1}\t=\t{mpos}\t{tlen}\t{seq1}\t{make_qual(read_len)}{rgtag}"
        )
        seq2 = make_seq(cname, mpos, read_len)
        lines.append(
            f"{qname}\t{flag2}\t{cname}\t{mpos}\t{mapq}\t{read_len}M\t=\t{pos}\t{-tlen}\t{seq2}\t{make_qual(read_len)}{rgtag}"
        )
    return lines[:n]


def make_sam(n: int = 1000, seed: int = 42, contigs=None, rgs=None, rg_ids=None) -> bytes:
    contigs = contigs or [("chr1", 1_000_000), ("chr2", 800_000)]
    header = make_header_lines(contigs, rgs=rgs)
    reads = random_reads(n, contigs, seed=seed, rg_ids=rg_ids)
    return ("\n".join(header + reads) + "\n").encode()
