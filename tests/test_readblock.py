"""ContigReadBlock (columnar HC transport) equivalence vs the ClipRead
list path: materialization fields, downsampling (incl. the Java-LCG
draws), and aln_slice."""

import numpy as np
import pytest

from elprep_tpu.filters.clipping import ClipRead
from elprep_tpu.hc.activity import (
    aln_slice,
    downsample,
    make_hc_params,
    max_reference_length,
)
from elprep_tpu.hc.readblock import (
    ContigReadBlock,
    aln_slice_block,
    downsample_block,
)
from elprep_tpu.io import sam as samio

SEED = 11


def _mk_batch(seed, n=300):
    from samgen import make_genome, make_header_lines, reads_from_genome

    contigs = [("chr1", 30_000), ("chr2", 20_000)]
    genome = make_genome(contigs, seed=seed)
    lines = make_header_lines(contigs) + reads_from_genome(
        n, contigs, genome, seed=seed)
    text = ("\n".join(lines) + "\n").encode()
    hdr, batch = samio.parse_sam(text)
    batch = batch.select(np.lexsort((batch.pos, batch.rname_id)))
    return hdr, batch


def _legacy_clipreads(batch):
    names_pool = (np.array(batch.names, dtype=bytes)
                  if batch.names else np.array([b""], dtype=bytes))
    out = {}
    qnames = batch.qname.astype(bytes)
    for i in range(len(batch)):
        rname = names_pool[batch.rname_id[i]].decode()
        out.setdefault(rname, []).append(ClipRead(
            flag=int(batch.flag[i]), pos=int(batch.pos[i]),
            pnext=int(batch.pnext[i]), tlen=int(batch.tlen[i]),
            mapq=int(batch.mapq[i]),
            cigar=list(zip(batch.cigar_len.row(i).tolist(),
                           batch.cigar_op.row(i).tobytes().decode())),
            seq=batch.seq.row(i).tobytes(), qual=batch.qual.row(i).tobytes(),
            rname=names_pool[batch.rname_id[i]],
            rnext=names_pool[batch.rnext_id[i]], qname=qnames[i], row=i,
        ))
    return out


def _blocks(batch):
    out = {}
    for rid in np.unique(batch.rname_id):
        nm = batch.names[rid]
        out[nm.decode()] = ContigReadBlock.from_batch(
            batch, np.flatnonzero(batch.rname_id == rid), nm)
    return out


def _same_read(a: ClipRead, b: ClipRead):
    return (a.flag, a.pos, a.pnext, a.tlen, a.mapq, a.cigar, a.seq, a.qual,
            a.rname, a.rnext, a.qname, a.row) == \
           (b.flag, b.pos, b.pnext, b.tlen, b.mapq, b.cigar, b.seq, b.qual,
            b.rname, b.rnext, b.qname, b.row)


def test_materialize_matches_legacy_loop():
    import random

    hdr, batch = _mk_batch(SEED)
    legacy = _legacy_clipreads(batch)
    blocks = _blocks(batch)
    assert set(legacy) == set(blocks)
    for contig, reads in legacy.items():
        mat = blocks[contig].materialize()
        assert len(mat) == len(reads)
        for a, b in zip(reads, mat):
            assert _same_read(a, b)
        assert blocks[contig].max_reference_length() == \
            max_reference_length(reads)
        assert np.array_equal(blocks[contig].pos,
                              [r.pos for r in reads])


def test_downsample_block_matches_list_incl_rng():
    """Force oversized alignment-start groups so the Java-LCG draw path
    runs; kept rows AND post-call RNG state must match."""
    import random

    hdr, batch = _mk_batch(SEED)
    legacy = _legacy_clipreads(batch)
    blocks = _blocks(batch)
    contig = max(legacy, key=lambda c: len(legacy[c]))
    params_a = make_hc_params("GVCF")
    params_b = make_hc_params("GVCF")
    params_a.max_reads_per_alignment_start = 2
    params_b.max_reads_per_alignment_start = 2
    # collapse positions into a few starts to guarantee big groups
    reads = [ClipRead(flag=r.flag, pos=(r.pos % 7) + 1, pnext=r.pnext,
                      tlen=r.tlen, mapq=r.mapq, cigar=list(r.cigar),
                      seq=r.seq, qual=r.qual, rname=r.rname, rnext=r.rnext,
                      qname=r.qname, row=r.row)
             for r in legacy[contig]]
    reads.sort(key=lambda r: r.pos)
    blk = blocks[contig]
    order = np.argsort((blk.pos % 7) + 1, kind="stable")
    blk = blk.select(order)
    blk.pos = (blk.pos % 7) + 1
    got_list = downsample(reads, params_a)
    got_block = downsample_block(blk, params_b)
    assert len(got_list) == len(got_block) < len(reads)
    mat = got_block.materialize()
    for a, b in zip(got_list, mat):
        assert (a.row, a.pos, a.qname) == (b.row, b.pos, b.qname)
    # identical number of LCG draws -> identical next output
    assert params_a.random.int31n(1 << 20) == params_b.random.int31n(1 << 20)


@pytest.mark.parametrize("lo,hi", [(1, 10_000), (5_000, 5_400), (29_000, 30_000)])
def test_aln_slice_block_matches_list(lo, hi):
    import random

    hdr, batch = _mk_batch(SEED)
    legacy = _legacy_clipreads(batch)
    blocks = _blocks(batch)
    for contig in blocks:
        reads = legacy[contig]
        mrl = max_reference_length(reads)
        want, _ = aln_slice(reads, lo, hi, mrl)
        got = aln_slice_block(blocks[contig], lo, hi, mrl).materialize()
        assert len(want) == len(got)
        for a, b in zip(want, got):
            assert _same_read(a, b)


def test_block_slice_and_pickle_roundtrip():
    import pickle
    import random

    hdr, batch = _mk_batch(SEED)
    blocks = _blocks(batch)
    blk = next(iter(blocks.values()))
    sub = blk.slice_rows(3, min(40, len(blk)))
    thawed = pickle.loads(pickle.dumps(sub, pickle.HIGHEST_PROTOCOL))
    for a, b in zip(sub.materialize(), thawed.materialize()):
        assert _same_read(a, b)
