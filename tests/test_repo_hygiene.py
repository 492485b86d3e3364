"""Guard against re-committing regenerable caches (r4 regression: 19 MB
of seeded bench photos landed in history; the .gitignore added later does
not untrack already-committed files). Seeded caches are regenerable by
construction — tracking them defeats their design."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Regenerable cache trees that must never be tracked.
FORBIDDEN_PREFIXES = (
    ".bench_photos/",
    ".jax_cache/",
    ".ap_bench/",
    "tests/.jax_cache_cpu/",
)
FORBIDDEN_SUFFIXES = (".npz", ".jpg", ".jpeg", ".png")
# Tracked binaries that are deliberate (docs assets etc.) go here.
ALLOWED = frozenset()


def _ls_files():
    try:
        out = subprocess.run(
            ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
            timeout=60)
    except (OSError, subprocess.TimeoutExpired):
        pytest.skip("git unavailable")
    if out.returncode != 0:
        pytest.skip("not a git checkout")
    return out.stdout.splitlines()


def test_no_tracked_cache_files():
    files = _ls_files()
    bad = [f for f in files
           if f.startswith(FORBIDDEN_PREFIXES) and f not in ALLOWED]
    assert not bad, f"regenerable cache files are tracked: {bad[:10]}"


def test_no_tracked_binary_artifacts():
    """No weight dumps or image caches anywhere in the tree."""
    files = _ls_files()
    bad = [f for f in files
           if f.lower().endswith(FORBIDDEN_SUFFIXES) and f not in ALLOWED]
    assert not bad, f"binary artifacts are tracked: {bad[:10]}"
