#!/usr/bin/env bash
# Reproduce the reference's published golden-md5 regression
# (/root/reference/examples/test.sh + test.md5) against ngsld-tpu.
#
# The upstream fixtures are NOT bundled in the reference repo: genotypes
# come from the sibling ngsSim repo's examples (testA.geno/testA.glf.gz),
# and the GL/posterior inputs are produced by an ANGSD binary
# (examples/test.sh:14-29). This script reruns that exact recipe when both
# tools are present, substituting ngsld-tpu for the reference binary in
# the 8-invocation option matrix, and diffs the md5s against the
# published examples/test.md5. See PARITY.md "Upstream golden md5s".
#
# Usage:
#   NGSSIM_EXAMPLES=/path/to/ngsSim/examples ANGSD_BIN=/path/to/angsd \
#     bash tests/refshim/upstream_md5.sh [workdir]
# Optional:
#   NGSLD_RUNNER  command to test (default: "python -m ngsld_tpu.cli";
#                 set to the reference binary to sanity-check the recipe)
#   NGSLD_REFERENCE_DIR  reference checkout (default /root/reference)
#
# The perl/awk fixture-generation one-liners below must match
# examples/test.sh:14-15 BYTE-FOR-BYTE (the .pos/.beagle/.glf md5s are
# pinned over their output); they are transcribed from there and are the
# only part of this harness whose text is dictated by the upstream
# artifact.
set -euo pipefail

SIM_DATA=${NGSSIM_EXAMPLES:-../../ngsSim/examples}
ANGSD=${ANGSD_BIN:-../../angsd/angsd}
REF=${NGSLD_REFERENCE_DIR:-/root/reference}
# --engine strict = the bit-exact conformance engine (byte-parity with
# the reference binary is its contract; the jax engine is f32)
RUNNER=${NGSLD_RUNNER:-python -m ngsld_tpu.cli --engine strict}
WORK=${1:-$(mktemp -d --suffix .ngsld_upstream)}

for f in "$SIM_DATA/testA.geno" "$SIM_DATA/testA.glf.gz" \
         "$SIM_DATA/testAF.ANC.fas.fai"; do
  if [[ ! -e "$f" ]]; then
    echo "SKIP: missing ngsSim fixture $f (set NGSSIM_EXAMPLES)" >&2
    exit 77
  fi
done
if ! command -v "${ANGSD%% *}" >/dev/null 2>&1 && [[ ! -x "$ANGSD" ]]; then
  echo "SKIP: ANGSD binary not found at $ANGSD (set ANGSD_BIN)" >&2
  exit 77
fi

N_IND=24
N_SITES=10000
cd "$WORK"
rm -f testLD*

# --- fixtures (recipe pinned by examples/test.sh:14-15; md5s of these
#     files are themselves part of test.md5) -----------------------------
cat "$SIM_DATA/testA.geno" \
  | perl -s -p -e 's/0 0/0/g; s/(\w) \1/2/g; s/\w \w/1/g; $n=s/2/2/g; tr/02/20/ if($n>$n_ind/2)' -- -n_ind=$N_IND \
  | awk '{print "chrSIM\t"NR"\t"$0}' | gzip -cfn --best > testLD_T.geno.gz
zcat testLD_T.geno.gz \
  | perl -an -e 'BEGIN{srand(12345)} if($pos > 10000) {$pos=0; $cnt++}; $pos += int(rand()*1000+1); print $F[0]."_".($cnt+1)."\t".$pos."\n"' \
  > testLD.pos

# --- ANGSD-derived GLs/posteriors (examples/test.sh:21,29) --------------
"$ANGSD" -glf "$SIM_DATA/testA.glf.gz" -fai "$SIM_DATA/testAF.ANC.fas.fai" \
  -nInd $N_IND -doMajorMinor 1 -doPost 1 -doMaf 1 -doGlf 3 -out testLD_3
gunzip -f testLD_3.glf.gz
rm -f testLD_3.glf.pos.gz
"$ANGSD" -glf "$SIM_DATA/testA.glf.gz" -fai "$SIM_DATA/testAF.ANC.fas.fai" \
  -nInd $N_IND -doMajorMinor 1 -doPost 1 -doMaf 1 -doGlf 2 -out testLD_2

# --- the 8-invocation option matrix (examples/test.sh:16-34), run
#     through $RUNNER instead of ../ngsLD --------------------------------
run() { $RUNNER --n_threads 10 --verbose 1 --n_ind $N_IND \
          --n_sites $N_SITES "$@" ; }
SORT="sort -k 1,1Vr -k 2,2V"
run --geno testLD_T.geno.gz --pos testLD.pos --max_kb_dist 20 --min_maf 0.05 --extend_out | $SORT > testLD_T.ld
run --geno testLD_T.geno.gz --pos testLD.pos --max_kb_dist 20 --min_maf 0.05 --extend_out --rnd_sample 0.5 --seed 12345 | $SORT > testLD_Tr.ld
run --geno testLD_3.glf --log_scale --pos testLD.pos --max_kb_dist 10 --min_maf 0.05 --extend_out | $SORT > testLD_3.ld
run --geno testLD_3.glf --log_scale --pos testLD.pos --max_kb_dist 10 --min_maf 0.05 --extend_out --call_geno | $SORT > testLD_3-CG.ld
run --geno testLD_3.glf --log_scale --pos testLD.pos --max_kb_dist 10 --min_maf 0.05 --extend_out --call_geno --N_thresh 0.3 --call_thresh 0.9 | $SORT > testLD_3-CGf.ld
run --geno testLD_2.beagle.gz --probs --pos testLD.pos --max_kb_dist 10 --min_maf 0.05 --extend_out | $SORT > testLD_2.ld
run --geno testLD_2.beagle.gz --probs --pos testLD.pos --max_kb_dist 10 --min_maf 0.05 --extend_out --call_geno | $SORT > testLD_2-CG.ld
run --geno testLD_2.beagle.gz --probs --pos testLD.pos --max_kb_dist 10 --min_maf 0.05 --extend_out --call_geno --N_thresh 0.3 --call_thresh 0.9 | $SORT > testLD_2-CGf.ld
run --geno testLD_2.beagle.gz --probs --pos testLD.pos --max_kb_dist 10 --min_maf 0.05 --extend_out --ignore_miss_data | $SORT > testLD_2.no_miss.ld
gunzip -f testLD_2.beagle.gz

# --- md5 check vs the published artifact (examples/test.sh:41-48) -------
rm -f ./*.arg
md5sum testLD* | fgrep -v '.gz' | sort -k 2,2 > got.md5
if diff got.md5 "$REF/examples/test.md5"; then
  echo "upstream_md5: ALL 12 GOLDEN MD5s MATCH ($WORK)"
else
  echo "upstream_md5: MISMATCH (work dir kept: $WORK)" >&2
  exit 1
fi
