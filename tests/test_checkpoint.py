"""Checkpoint/resume: per-block shards, manifest guard, identical output."""

import io
import json
import os

import pytest

from ngsld_tpu.config import Params
from ngsld_tpu.engine import run_jax
from ngsld_tpu.strict import StrictError
from ngsld_tpu.utils.simulate import simulate, write_all


@pytest.fixture(scope="module")
def fixdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ck"))
    return write_all(simulate(n_ind=8, n_sites=200, seed=41), d)


def base_pars(fixdir, **kw):
    d = dict(in_geno=fixdir["beagle"], in_probs=True, n_ind=8, n_sites=200,
             in_pos=fixdir["pos"], max_kb_dist=10, min_maf=0.05, seed=5,
             extend_out=True, precision="f64", chunk_pairs=128, verbose=0)
    d.update(kw)
    return Params(**d).finalize()


def test_checkpoint_output_identical(fixdir, tmp_path):
    plain = io.StringIO()
    run_jax(base_pars(fixdir), out_fh=plain)
    ck = io.StringIO()
    run_jax(base_pars(fixdir, checkpoint=str(tmp_path / "ck")), out_fh=ck)
    assert plain.getvalue() == ck.getvalue()
    parts = [p for p in os.listdir(tmp_path / "ck") if p.startswith("part_")]
    assert len(parts) > 1  # actually sharded


def test_resume_skips_completed_blocks(fixdir, tmp_path):
    cdir = tmp_path / "ck"
    first = io.StringIO()
    run_jax(base_pars(fixdir, checkpoint=str(cdir)), out_fh=first)
    # delete one shard; resume must recompute only that block
    victim = sorted(p for p in os.listdir(cdir) if p.startswith("part_"))[1]
    os.remove(cdir / victim)
    second = io.StringIO()
    run_jax(base_pars(fixdir, checkpoint=str(cdir)), out_fh=second)
    assert first.getvalue() == second.getvalue()


def ring_pars(fixdir, **kw):
    # max_kb_dist=0 (all pairs) so the band spans several ring steps even
    # at this tiny fixture scale — the resume test needs steps beyond t=0
    d = dict(ring=True, ring_sub=2, max_kb_dist=0, shard=8)
    d.update(kw)
    return base_pars(fixdir, **d)


def test_ring_checkpoint_output_identical(fixdir, tmp_path):
    plain = io.StringIO()
    run_jax(ring_pars(fixdir), out_fh=plain)
    ck = io.StringIO()
    run_jax(ring_pars(fixdir, checkpoint=str(tmp_path / "rck")), out_fh=ck)
    assert plain.getvalue() == ck.getvalue()
    steps = [p for p in os.listdir(tmp_path / "rck") if p.startswith("ring_")]
    assert len(steps) > 1  # step-granular shards exist


def test_ring_resume_mid_sweep(fixdir, tmp_path):
    cdir = tmp_path / "rck"
    first = io.StringIO()
    run_jax(ring_pars(fixdir, checkpoint=str(cdir)), out_fh=first)
    # simulate a crash mid-sweep: keep only step 0 of every sub-ring (a
    # prefix, as an interrupted run would leave) and resume
    kept = removed = 0
    for p in os.listdir(cdir):
        if p.startswith("ring_") and "_t0000" not in p:
            os.remove(cdir / p)
            removed += 1
        elif p.startswith("ring_"):
            kept += 1
    assert kept and removed
    second = io.StringIO()
    run_jax(ring_pars(fixdir, checkpoint=str(cdir)), out_fh=second)
    assert first.getvalue() == second.getvalue()


def test_ring_manifest_guards_decomposition(fixdir, tmp_path):
    cdir = tmp_path / "rck"
    run_jax(ring_pars(fixdir, checkpoint=str(cdir)), out_fh=io.StringIO())
    with pytest.raises(StrictError, match="different run configuration"):
        run_jax(ring_pars(fixdir, checkpoint=str(cdir), ring_sub=1),
                out_fh=io.StringIO())


def test_manifest_guards_config_mismatch(fixdir, tmp_path):
    cdir = tmp_path / "ck"
    run_jax(base_pars(fixdir, checkpoint=str(cdir)), out_fh=io.StringIO())
    with pytest.raises(StrictError, match="different run configuration"):
        run_jax(base_pars(fixdir, checkpoint=str(cdir), min_maf=0.2),
                out_fh=io.StringIO())
    man = json.load(open(cdir / "MANIFEST.json"))
    assert "fingerprint" in man


def test_manifest_guards_shard_decomposition(fixdir, tmp_path):
    """Resuming with a --shard that changes the EFFECTIVE chunk (and thus
    the part_NNNNNN block decomposition) must be rejected: silently reusing
    shards from a different decomposition would duplicate/drop pairs."""
    cdir = tmp_path / "ck"
    run_jax(base_pars(fixdir, checkpoint=str(cdir), chunk_pairs=101,
                      shard=1), out_fh=io.StringIO())
    with pytest.raises(StrictError, match="different run configuration"):
        run_jax(base_pars(fixdir, checkpoint=str(cdir), chunk_pairs=101,
                          shard=4), out_fh=io.StringIO())
