"""Provenance stamps for evidence artifacts (PARITY_TPU.json, BENCH_*.json).

Round-2 verdict: BENCH and PARITY were captured at different git revisions
with no recorded rev in either artifact, so a stale parity file silently
certified a four-revisions-older kernel.  Every artifact writer now embeds
``stamp()`` and readers can call ``engine_sources_changed_since`` to detect
when the compute-path sources differ between the artifact's rev and HEAD.
"""

import subprocess
import time

# Files whose change invalidates on-chip parity evidence: everything on the
# compute path (kernels, engines, pipeline wiring, constants).
ENGINE_PATHS = (
    "descriptools_tpu/ops",
    "descriptools_tpu/parallel",
    "descriptools_tpu/pipeline.py",
    "descriptools_tpu/d8.py",
    "descriptools_tpu/constants.py",
    "descriptools_tpu/evaluation.py",
    "descriptools_tpu/oracle",
)


def _git(repo_root, *args):
    out = subprocess.run(
        ["git", *args], capture_output=True, text=True, cwd=repo_root
    )
    return out.returncode, out.stdout.strip()


def git_rev(repo_root):
    rc, rev = _git(repo_root, "rev-parse", "HEAD")
    return rev if rc == 0 else None


def stamp(repo_root):
    """Provenance dict to merge into every evidence artifact."""
    import jax

    rev = git_rev(repo_root)
    rc, _ = _git(repo_root, "diff", "--quiet", "HEAD", "--", *ENGINE_PATHS)
    return {
        "rev": rev,
        "engine_sources_dirty": bool(rc != 0) if rev else None,
        "jax_version": jax.__version__,
        "time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def engine_sources_changed_since(repo_root, rev):
    """True iff any ENGINE_PATHS file differs between ``rev`` and HEAD
    (including uncommitted changes).  None when git can't answer (missing
    rev, not a repo)."""
    if not rev:
        return None
    rc, _ = _git(repo_root, "cat-file", "-e", f"{rev}^{{commit}}")
    if rc != 0:
        return None
    rc, _ = _git(repo_root, "diff", "--quiet", rev, "--", *ENGINE_PATHS)
    return rc != 0
