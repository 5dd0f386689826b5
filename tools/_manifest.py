"""Shared manifest plumbing for the three gate tools.

plan_audit / oracle_lint / empty_sweep each keep a JSON manifest of the
registry entries covered by their last CLEAN full run; the suite's
registration gates re-check only entries NOT in the manifest. The
load / write-only-on-content-change / --no-write logic used to be
duplicated nearly verbatim across the three tools (round-9 ADVICE) —
this module is the single copy so they cannot drift.

A manifest is a sorted JSON list of names. Writes happen only when the
content would change, so a verification run on a clean tree leaves
`git status` clean; --no-write turns a would-be write into a report.
"""

from __future__ import annotations

import json
import os


def manifest_path(filename: str) -> str:
    """Absolute path of a manifest file living next to the tools."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), filename)


def load_manifest(path: str) -> set[str]:
    try:
        with open(path) as fh:
            return set(json.load(fh))
    except FileNotFoundError:
        return set()


def write_manifest_if_changed(
    path: str, names: list[str], no_write: bool, noun: str = "queries"
) -> None:
    """Write ``sorted(names)`` to ``path`` only when the content would
    change; honor ``no_write`` by reporting instead of writing."""
    payload = json.dumps(sorted(names), indent=0)
    try:
        with open(path) as fh:
            current = fh.read()
    except FileNotFoundError:
        current = None
    if current == payload:
        print(f"manifest unchanged: {len(names)} {noun} ({path})")
        return
    if no_write:
        print(f"manifest DIFFERS but --no-write given ({path})")
        return
    with open(path, "w") as fh:
        fh.write(payload)
    print(f"manifest written: {len(names)} {noun} -> {path}")
