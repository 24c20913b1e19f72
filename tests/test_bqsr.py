"""BQSR device pipeline vs the sequential reference-semantics oracle."""

import numpy as np
import pytest

from elprep_tpu.core.header import SortingOrder
from elprep_tpu.filters import add_refid
from elprep_tpu.filters.bqsr import (
    BaseRecalibrator,
    NCTX,
    apply_bqsr_filter,
    initialize_static_quantized_scores,
)
from elprep_tpu.io import intervals as iv
from elprep_tpu.io.fasta import MappedFasta, RefIndex, to_elfasta
from elprep_tpu.io.sam import parse_sam

import bqsr_oracle
from samgen import make_genome, make_header_lines, reads_from_genome

CONTIGS = [("chr1", 60000), ("chr2", 40000)]
RGS = [
    {"ID": "grp1", "LB": "libA", "PU": "unit1"},
    {"ID": "grp2", "LB": "libB", "PU": "unit2"},
    {"ID": "grp3", "LB": "libB"},  # no PU -> covariate = ID
]
RG_IDS = ["grp1", "grp2", "grp3"]
MAX_CYCLE = 500


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bqsr")
    genome = make_genome(CONTIGS, seed=3)
    elf = str(tmp / "ref.elfasta")
    to_elfasta(genome, elf)
    ref = RefIndex(MappedFasta(elf))

    header_lines = make_header_lines(CONTIGS, rgs=RGS)
    reads = reads_from_genome(800, CONTIGS, genome, seed=5, rg_ids=RG_IDS)
    sam = ("\n".join(header_lines + reads) + "\n").encode()
    hdr, batch = parse_sam(sam)
    add_refid(hdr)(batch)

    # known sites over some positions
    known = {
        "chr1": iv.flatten(iv.sort_by_start(iv.make([100, 5000, 20000], [200, 5100, 20500]))),
    }
    sites = str(tmp / "known.elsites")
    iv.to_elsites_file(known, sites)

    genome_str = {k: v for k, v in genome.items()}
    return genome_str, ref, sites, hdr, batch, known


def _ctx_key_to_idx(key: int) -> int:
    return ((key >> 4) & 3) * 4 + ((key >> 6) & 3)


def test_elfasta_roundtrip(tmp_path):
    genome = make_genome([("c1", 1000), ("c2", 777)], seed=8)
    path = str(tmp_path / "x.elfasta")
    to_elfasta(genome, path)
    mf = MappedFasta(path)
    assert mf.seq("c1").tobytes() == genome["c1"]
    assert mf.seq("c2").tobytes() == genome["c2"]


def test_recalibrate_tables_match_oracle(setup):
    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    tables = recal.recalibrate(hdr, batch, MAX_CYCLE)

    qs, cyc, ctx = bqsr_oracle.recalibrate_oracle(hdr, batch, genome, known, MAX_CYCLE)
    assert qs, "oracle produced no entries — generator broken"

    rg_index = {name: i for i, name in enumerate(tables.rg_names)}
    # QualityScores
    got = {}
    for i, rg in enumerate(tables.rg_names):
        for q in range(94):
            if tables.qs_obs[i, q] > 0:
                got[(rg, q)] = [int(tables.qs_obs[i, q]), int(tables.qs_mism[i, q])]
    assert got == qs

    got_cyc = {}
    for i, rg in enumerate(tables.rg_names):
        nz = np.nonzero(tables.cyc_obs[i])
        for q, c in zip(*nz):
            got_cyc[(rg, int(q), int(c) - MAX_CYCLE)] = [
                int(tables.cyc_obs[i, q, c]), int(tables.cyc_mism[i, q, c])
            ]
    assert got_cyc == cyc

    got_ctx = {}
    for i, rg in enumerate(tables.rg_names):
        nz = np.nonzero(tables.ctx_obs[i])
        for q, c in zip(*nz):
            got_ctx[(rg, int(q), int(c))] = [
                int(tables.ctx_obs[i, q, c]), int(tables.ctx_mism[i, q, c])
            ]
    want_ctx = {(rg, q, _ctx_key_to_idx(k)): v for (rg, q, k), v in ctx.items()}
    assert got_ctx == want_ctx


def test_finalize_matches_oracle(setup):
    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    tables = recal.recalibrate(hdr, batch, MAX_CYCLE)
    tables.finalize()
    for i, rg in enumerate(tables.rg_names):
        for q in range(94):
            if tables.qs_obs[i, q] > 0:
                want = bqsr_oracle.empirical_quality(
                    int(tables.qs_obs[i, q]), int(tables.qs_mism[i, q]), float(q)
                )
                assert int(tables.qs_eq[i, q]) == want


def test_combined_rg_table(setup):
    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    tables = recal.recalibrate(hdr, batch, MAX_CYCLE)
    qs, _, _ = bqsr_oracle.recalibrate_oracle(hdr, batch, genome, known, MAX_CYCLE)
    want = bqsr_oracle.combined_rg_oracle(qs)
    got = tables.combined_rg_table()
    assert set(got) == set(want)
    for rg in want:
        assert got[rg][1:] == want[rg][1:]
        assert got[rg][0] == pytest.approx(want[rg][0], abs=1e-9)


def test_apply_bqsr_matches_oracle(setup):
    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    tables = recal.recalibrate(hdr, batch, MAX_CYCLE)
    tables.finalize()
    qs, cyc, ctx = bqsr_oracle.recalibrate_oracle(hdr, batch, genome, known, MAX_CYCLE)
    ctx_idx = {(rg, q, _ctx_key_to_idx(k)): v for (rg, q, k), v in ctx.items()}

    _, quant = tables.quantization(0)  # quantizeLevels=0 -> identity
    want_quals = bqsr_oracle.apply_oracle(hdr, batch, qs, cyc, ctx, MAX_CYCLE, quant, None)

    bf = apply_bqsr_filter(tables, quantize_levels=0, sqq=(), max_cycle=MAX_CYCLE)(hdr)
    bf(batch)
    for i in range(len(batch)):
        got = batch.qual.row(i).tobytes()
        assert got == want_quals[i], f"read {i}: {list(got[:20])} != {list(want_quals[i][:20])}"


def test_report_prints(setup, tmp_path):
    from elprep_tpu.filters.bqsr_report import print_bqsr_tables

    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    tables = recal.recalibrate(hdr, batch, MAX_CYCLE)
    tables.finalize()
    out = str(tmp_path / "recal.txt")
    print_bqsr_tables(tables, out)
    text = open(out).read()
    assert text.startswith("#:GATKReport.v1.1:5\n")
    assert "#:GATKTable:RecalTable0:\n" in text
    assert "#:GATKTable:RecalTable1:\n" in text
    assert "#:GATKTable:RecalTable2:\n" in text
    assert "Quantized:Quality quantization map" in text


def test_static_quantized_scores():
    lut = initialize_static_quantized_scores([10, 20, 30])
    assert lut[0] == 0 and lut[5] == 5
    assert all(int(v) in (10, 20, 30) for v in lut[10:200])


def test_intermediate_roundtrip(setup, tmp_path):
    from elprep_tpu.filters.bqsr_report import load_intermediate, save_intermediate

    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    tables = recal.recalibrate(hdr, batch, MAX_CYCLE)
    p = str(tmp_path / "tabs.npz")
    save_intermediate(tables, p)
    loaded = load_intermediate(p)
    assert loaded.rg_names == tables.rg_names
    np.testing.assert_array_equal(loaded.qs_obs, tables.qs_obs)
    np.testing.assert_array_equal(loaded.cyc_mism, tables.cyc_mism)


def test_prep_native_matches_python_fallback(setup, monkeypatch):
    """_prep_recal_native output dict == the per-read Python fallback
    (same padded covariate columns, clipped flags/positions, known-sites
    skip slices)."""
    from elprep_tpu.filters.bqsr import (
        BaseRecalibrator,
        prep_recalibrate_columns,
    )

    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    fast = prep_recalibrate_columns(recal, hdr, batch, None, MAX_CYCLE)
    monkeypatch.setenv("ELPREP_TPU_NO_NATIVE_CLIP", "1")
    slow = prep_recalibrate_columns(recal, hdr, batch, None, MAX_CYCLE)
    assert fast["m"] == slow["m"] and fast["n_real"] == slow["n_real"]
    assert fast["n_real"] > 100 and fast["skip"].any()
    for key in ("L", "C"):
        assert fast[key] == slow[key], key
    for key in ("base", "qual", "skip", "seq_len", "flag", "pos", "rg",
                "refoff", "op_class", "op_len"):
        assert np.array_equal(fast[key], slow[key]), key


def test_pooled_recalibrate_matches_serial(setup):
    """The worker-pool table build (workers prep their chunk, run the
    jitted table build on CPU, and return only partial tables through
    the result pipes) must produce exactly the serial tables — the
    scatter-adds are commutative int sums."""
    from elprep_tpu.hc.parallel import get_pool

    genome, ref, sites, hdr, _batch, known = setup
    reads = reads_from_genome(5000, CONTIGS, genome, seed=11, rg_ids=RG_IDS)
    header_lines = make_header_lines(CONTIGS, rgs=RGS)
    sam = ("\n".join(header_lines + reads) + "\n").encode()
    hdr2, big = parse_sam(sam)
    add_refid(hdr2)(big)

    recal = BaseRecalibrator([sites], ref)
    serial = recal.recalibrate(hdr2, big, MAX_CYCLE)
    pool = get_pool(2)
    if pool is None:
        pytest.skip("worker pool unavailable")
    pooled = recal.recalibrate(hdr2, big, MAX_CYCLE, pool=pool)
    assert pooled.rg_names == serial.rg_names
    for k in ("qs_obs", "qs_mism", "cyc_obs", "cyc_mism", "ctx_obs",
              "ctx_mism"):
        np.testing.assert_array_equal(getattr(pooled, k), getattr(serial, k),
                                      err_msg=k)


def test_accumulate_partials_multi_slice(setup):
    """Forcing multiple fixed-size slices (the WGS-scale path) must sum
    to the single-slice tables — regression for the read-only jax view
    reaching the accumulator's +=."""
    from elprep_tpu.filters.bqsr import (accumulate_table_partials,
                                         prep_recalibrate_columns)

    genome, ref, sites, hdr, batch, known = setup
    recal = BaseRecalibrator([sites], ref)
    p = prep_recalibrate_columns(recal, hdr, batch, None, MAX_CYCLE)
    assert p["n_real"] > 128
    one, mac1 = accumulate_table_partials([p], ref.classes, MAX_CYCLE, 3)
    many, mac2 = accumulate_table_partials([p], ref.classes, MAX_CYCLE, 3,
                                           max_rows=128)
    assert mac1 == mac2
    for a, b in zip(one, many):
        np.testing.assert_array_equal(a, b)


def test_native_skip_sites_matches_python(tmp_path, monkeypatch):
    """Fuzz the native known-sites skip engine (bqsr_skip_sites) against
    the per-read Python loop: dense randomized sites so most reads carry
    skip slices, messy cigars from the generator."""
    from elprep_tpu import native
    from elprep_tpu.filters.bqsr import prep_recalibrate_columns

    if not (native.available()
            and hasattr(native.get_lib(), "bqsr_skip_sites")):
        pytest.skip("native skip engine unavailable")
    genome = make_genome(CONTIGS, seed=11)
    elf = str(tmp_path / "ref.elfasta")
    to_elfasta(genome, elf)
    ref = RefIndex(MappedFasta(elf))
    header_lines = make_header_lines(CONTIGS, rgs=RGS)
    reads = reads_from_genome(600, CONTIGS, genome, seed=13, rg_ids=RG_IDS)
    sam = ("\n".join(header_lines + reads) + "\n").encode()
    hdr, batch = parse_sam(sam)
    add_refid(hdr)(batch)
    rng = np.random.RandomState(7)
    known = {}
    for name, ln in CONTIGS:
        starts = np.sort(rng.randint(1, ln - 30, 400))
        ends = starts + rng.randint(1, 25, 400)
        known[name] = iv.flatten(iv.sort_by_start(iv.make(starts, ends)))
    sites = str(tmp_path / "dense.elsites")
    iv.to_elsites_file(known, sites)
    recal = BaseRecalibrator([sites], ref)

    p_native = prep_recalibrate_columns(recal, hdr, batch, None, MAX_CYCLE)
    monkeypatch.setenv("ELPREP_TPU_NO_NATIVE_SKIP", "1")
    p_py = prep_recalibrate_columns(recal, hdr, batch, None, MAX_CYCLE)
    assert p_native["skip"].shape == p_py["skip"].shape
    assert p_native["skip"].any(), "fixture produced no skip slices"
    assert np.array_equal(p_native["skip"], p_py["skip"])


def test_native_bqsr_histograms_match_numpy_oracle():
    """Fuzz the one-pass C++ histogram against the numpy where+bincount
    sequence it replaced (incl. negative, ==size and >size codes, which
    must drop like the device scatter's mode="drop")."""
    from elprep_tpu import native

    rng = np.random.RandomState(42)
    for trial in range(20):
        m = int(rng.randint(0, 5000))
        sizes = (int(rng.randint(1, 200)), int(rng.randint(1, 3000)),
                 int(rng.randint(1, 300)))
        idxs = [rng.randint(-5, s + 5, m).astype(np.int32) for s in sizes]
        err = (rng.rand(m) < 0.1).astype(np.int32)
        got = native.bqsr_histograms(*idxs, err, *sizes)
        if got is None:
            import pytest

            pytest.skip("native lib unavailable")
        errb = err.astype(bool)
        want = []
        for idx, size in zip(idxs, sizes):
            idx = np.where((idx < 0) | (idx > size), size, idx)
            want.append(np.bincount(idx, minlength=size + 1)[:size].astype(np.int32))
            want.append(np.bincount(idx[errb], minlength=size + 1)[:size].astype(np.int32))
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()


def test_native_covariate_tables_match_jit_oracle():
    """Fuzz the fused C++ covariate engine against the jitted
    recalibrate_codes + histogram sequence on adversarial random slices:
    random cigars (under- and over-covering seq_len), rg=-1 rows, quals
    spanning the tail/interesting/out-of-table ranges, both strands and
    mate orders, cycle values beyond max_cycle."""
    import jax.numpy as jnp

    from elprep_tpu import native
    from elprep_tpu.ops import bqsr_ops

    if native.bqsr_covariate_tables(
            dict(m=0, base=np.zeros((0, 4), np.uint8),
                 qual=np.zeros((0, 4), np.uint8),
                 skip=np.zeros((0, 4), bool), seq_len=np.zeros(0, np.int32),
                 flag=np.zeros(0, np.int32), pos=np.zeros(0, np.int32),
                 rg=np.zeros(0, np.int32), refoff=np.zeros(0, np.int64),
                 op_class=np.zeros((0, 2), np.int8),
                 op_len=np.zeros((0, 2), np.int32)),
            np.zeros(16, np.uint8), 10, 1) is None:
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.RandomState(7)
    for trial in range(8):
        m = int(rng.randint(1, 60))
        L = int(rng.randint(4, 90))
        C = int(rng.randint(1, 6))
        n_rg = int(rng.randint(1, 4))
        max_cycle = int(rng.randint(8, 200))
        ref_len = int(rng.randint(50, 4000))
        sl = dict(
            m=m,
            base=rng.choice(np.frombuffer(b"ACGTNacgt*", np.uint8),
                            (m, L)).astype(np.uint8),
            qual=rng.randint(0, 100, (m, L)).astype(np.uint8),
            skip=rng.rand(m, L) < 0.2,
            seq_len=rng.randint(0, L + 1, m).astype(np.int32),
            flag=rng.randint(0, 256, m).astype(np.int32),
            pos=rng.randint(1, ref_len, m).astype(np.int32),
            rg=(rng.randint(0, n_rg + 1, m) - 1).astype(np.int32),
            refoff=rng.randint(0, max(1, ref_len - 40), m).astype(np.int64),
            op_class=rng.randint(0, 9, (m, C)).astype(np.int8),
            op_len=rng.randint(0, L, (m, C)).astype(np.int32),
        )
        classes = rng.randint(0, 5, ref_len).astype(np.uint8)

        got, mac = native.bqsr_covariate_tables(sl, classes, max_cycle, n_rg)

        qs_idx, cyc_idx, ctx_idx, err, jmac = (
            np.asarray(a) for a in bqsr_ops.recalibrate_codes(
                *(jnp.asarray(sl[k]) for k in
                  ("base", "qual", "seq_len", "flag", "pos", "rg",
                   "refoff", "skip", "op_class", "op_len")),
                jnp.asarray(classes), max_cycle=max_cycle, n_rg=n_rg))
        nrg_q = n_rg * 94
        sizes = (nrg_q, nrg_q * (2 * max_cycle + 1), nrg_q * 16)
        errb = err.astype(bool)
        want = []
        for idx, size in zip((qs_idx, cyc_idx, ctx_idx), sizes):
            idx = np.where((idx < 0) | (idx > size), size, idx)
            want.append(np.bincount(idx, minlength=size + 1)[:size]
                        .astype(np.int32))
            want.append(np.bincount(idx[errb], minlength=size + 1)[:size]
                        .astype(np.int32))
        assert int(jmac) == mac, (trial, int(jmac), mac)
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist(), trial


def test_native_apply_quals_match_jit_oracle():
    """Fuzz the C++ ApplyBQSR engine against the jitted apply_bqsr:
    random tables, rg=-1 / absent-RG rows, qual tail and >93 values,
    both strands and mate orders, cycles clipped at the table edge."""
    import jax.numpy as jnp

    from elprep_tpu import native
    from elprep_tpu.ops import bqsr_ops

    rng = np.random.RandomState(31)
    for trial in range(8):
        m = int(rng.randint(1, 50))
        L = int(rng.randint(4, 80))
        n_rg = int(rng.randint(1, 4))
        max_cycle = int(rng.randint(8, 120))
        ncyc = 2 * max_cycle + 1
        base = rng.choice(np.frombuffer(b"ACGTNacgt*", np.uint8),
                          (m, L)).astype(np.uint8)
        qual = rng.randint(0, 100, (m, L)).astype(np.uint8)
        seq_len = rng.randint(0, L + 1, m).astype(np.int32)
        flag = rng.randint(0, 256, m).astype(np.int32)
        rg = (rng.randint(0, n_rg + 1, m) - 1).astype(np.int32)
        rg_present = (rng.rand(n_rg) < 0.8)
        cond_prior = rng.randint(1, 90, (n_rg, 94)).astype(np.int32)
        d_cyc = rng.randint(-20, 20, (n_rg, 94, ncyc)).astype(np.int32)
        d_ctx = rng.randint(-20, 20, (n_rg, 94, 17)).astype(np.int32)
        quant = rng.randint(0, 94, 94).astype(np.uint8)
        sqq = rng.randint(0, 94, 255).astype(np.uint8)

        got = native.bqsr_apply_quals(base, qual, seq_len, flag, rg,
                                      rg_present, cond_prior, d_cyc, d_ctx,
                                      quant, sqq, max_cycle)
        if got is None:
            import pytest

            pytest.skip("native lib unavailable")
        newq_n, mac_n = got
        newq_j, mac_j = bqsr_ops.apply_bqsr(
            jnp.asarray(base), jnp.asarray(qual), jnp.asarray(seq_len),
            jnp.asarray(flag), jnp.asarray(rg), jnp.asarray(rg_present),
            jnp.asarray(cond_prior), jnp.asarray(d_cyc), jnp.asarray(d_ctx),
            jnp.asarray(quant), jnp.asarray(sqq), max_cycle=max_cycle)
        newq_j = np.asarray(newq_j)
        assert int(mac_j) == mac_n, trial
        # compare only valid columns (pad columns keep input qual in
        # both engines, but are never read back)
        cols = np.arange(L)
        vmask = cols[None, :] < seq_len[:, None]
        assert newq_n[vmask].tolist() == newq_j[vmask].tolist(), trial


def test_native_padded_to_ragged_matches_mask_writeback():
    """Fuzz the native padded->ragged unpad (the ApplyBQSR qual
    writeback fast path) against the boolean-mask numpy formulation it
    replaced: random ragged lengths incl. zero-length rows, width
    wider than the longest row, and a non-u8 dtype."""
    from elprep_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(77)
    for trial in range(10):
        n = int(rng.randint(1, 400))
        lens = rng.randint(0, 60, n).astype(np.int64)
        lens[rng.rand(n) < 0.2] = 0
        off = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        width = int(lens.max() if lens.max() else 1) + int(rng.randint(0, 9))
        dtype = np.uint8 if trial % 2 == 0 else np.int32
        padded = rng.randint(0, 250, (n, width)).astype(dtype)
        got = np.full(int(off[-1]), 255, dtype)
        ok = native.padded_to_ragged(padded, off, got)
        assert ok
        mask = np.arange(width)[None, :] < lens[:, None]
        assert got.tolist() == padded[mask].tolist(), trial


def test_native_apply_quals_ragged_matches_padded():
    """Fuzz the ragged in-place ApplyBQSR against the padded engine
    (itself fuzzed against the jit oracle above): random ragged
    lengths incl. zero-length rows, rg=-1 rows, both strands/mate
    orders. The ragged twin must mutate the qual buffer to exactly the
    padded engine's writeback."""
    from elprep_tpu import native

    if native.get_lib() is None or not hasattr(native.get_lib(),
                                               "bqsr_apply_quals_ragged"):
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(113)
    for trial in range(8):
        m = int(rng.randint(1, 60))
        n_rg = int(rng.randint(1, 4))
        max_cycle = int(rng.randint(8, 120))
        ncyc = 2 * max_cycle + 1
        lens = rng.randint(0, 70, m).astype(np.int64)
        lens[rng.rand(m) < 0.15] = 0
        off = np.zeros(m + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        total = int(off[-1])
        base_flat = rng.choice(np.frombuffer(b"ACGTNacgt*", np.uint8),
                               total).astype(np.uint8)
        qual_flat = rng.randint(0, 100, total).astype(np.uint8)
        flag = rng.randint(0, 256, m).astype(np.int32)
        rg = (rng.randint(0, n_rg + 1, m) - 1).astype(np.int32)
        rg_present = (rng.rand(n_rg) < 0.8).astype(np.uint8)
        cond_prior = rng.randint(1, 90, (n_rg, 94)).astype(np.int32)
        d_cyc = rng.randint(-20, 20, (n_rg, 94, ncyc)).astype(np.int32)
        d_ctx = rng.randint(-20, 20, (n_rg, 94, 17)).astype(np.int32)
        quant = rng.randint(0, 94, 94).astype(np.uint8)
        sqq = rng.randint(0, 94, 255).astype(np.uint8)

        width = int(lens.max(initial=0)) + 3
        pad = lambda flat: np.stack([  # noqa: E731
            np.pad(flat[off[i]:off[i + 1]], (0, width - lens[i]))
            for i in range(m)])
        newq_p, mac_p = native.bqsr_apply_quals(
            pad(base_flat), pad(qual_flat), lens.astype(np.int32), flag, rg,
            rg_present, cond_prior, d_cyc, d_ctx, quant, sqq, max_cycle)

        got = qual_flat.copy()
        mac_r = native.bqsr_apply_quals_ragged(
            base_flat, got, off, flag, rg, rg_present, cond_prior, d_cyc,
            d_ctx, quant, sqq, max_cycle)
        assert mac_r == mac_p, trial
        mask = np.arange(width)[None, :] < lens[:, None]
        assert got.tolist() == newq_p[mask].tolist(), trial
