"""Prototype HC golden fixture: het SNP + het 3bp deletion, clean reads."""
import random, sys

# --- reference: 600bp, all 10-mers unique (checked) ---
rng = random.Random(20260820)
while True:
    ref = "".join(rng.choice("ACGT") for _ in range(600))
    kmers = {ref[i:i+10] for i in range(len(ref)-9)}
    if len(kmers) == len(ref)-9 and "N" not in ref:
        # also unique at k=25 follows from k=10 uniqueness
        break
print("ref ok", len(ref), file=sys.stderr)

SNP_POS = 201        # 1-based; ref base ref[200]
DEL_POS = 401        # deletion of ref[401:404] (1-based 402-404), anchor at 401
ref_snp = ref[SNP_POS-1]
ALT_SNP = {"A":"C","C":"G","G":"T","T":"A"}[ref_snp]

reads = []
Q = "I"*40  # Q40 uniform
def add(qname, pos, seq, cigar, flag=0, mapq=60):
    reads.append(f"{qname}\t{flag}\t chr1\t{pos}\t{mapq}\t{cigar}\t*\t0\t0\t{seq}\t{Q}\tRG:Z:rg1".replace("\t chr1","\tchr1"))

# SNP site: 8 reads, staggered starts, 40M each, covering pos 201
# starts: 170,174,178,182,186,190,194,198 -> read offsets of SNP: 31,27,23,19,15,11,7,3
starts = [170,174,178,182,186,190,194,198]
for i, s in enumerate(starts):
    seq = ref[s-1:s-1+40]
    if i % 2 == 1:  # alt reads: odd indices
        off = SNP_POS - s
        seq = seq[:off] + ALT_SNP + seq[off+1:]
    add(f"s{i:02d}", s, seq, "40M")

# DEL site: het 3bp deletion of ref[DEL_POS..DEL_POS+2] (1-based DEL_POS+1..DEL_POS+3 deleted, anchor DEL_POS)
# ref reads: 40M; alt reads: CIGAR with 3D after k matched bases
dstarts = [366,374,378,382,386,390,394,398]
for i, s in enumerate(dstarts):
    if i % 2 == 0:
        seq = ref[s-1:s-1+40]
        add(f"d{i:02d}", s, seq, "40M")
    else:
        k = DEL_POS - s + 1          # matched bases before deletion (through anchor)
        seq = ref[s-1:s-1+k] + ref[s-1+k+3:s-1+40+3]
        add(f"d{i:02d}", s, seq, f"{k}M3D{40-k}M")

hdr = ["@HD\tVN:1.6\tSO:coordinate",
       "@SQ\tSN:chr1\tLN:600",
       "@RG\tID:rg1\tLB:lib1\tPU:u1\tSM:sample1"]
open("/tmp/hcgold/in.sam","w").write("\n".join(hdr+reads)+"\n")
open("/tmp/hcgold/ref.fasta","w").write(">chr1\n"+ref+"\n")
print("SNP", SNP_POS, ref_snp, ">", ALT_SNP, "DEL anchor", DEL_POS, "del", ref[DEL_POS:DEL_POS+3], file=sys.stderr)
