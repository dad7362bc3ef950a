"""Lint: every GLOBAL window (Window.orderBy(...) without a
partitionBy, or an empty Window.partitionBy()) in the package must
carry a `bounded-global-window` marker comment within the three
preceding lines, documenting why its frame is bounded.

A global window funnels the whole frame onto ONE task — safe only on
frames already reduced to a bounded row count (a limit(k), a per-key
or per-domain aggregate, a bucket-totals table). The marker forces
every new site to state its bound instead of cargo-culting the
pattern onto an unbounded frame (round-3 verdict #6)."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "tits_spark"
GLOBAL_WINDOW = re.compile(r"Window\.orderBy\(|Window\.partitionBy\(\)")
MARKER = "bounded-global-window"


def test_every_global_window_is_marked_bounded():
    unmarked = []
    for path in sorted(PKG.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if not GLOBAL_WINDOW.search(line):
                continue
            ctx = "\n".join(lines[max(0, i - 3): i + 1])
            if MARKER not in ctx:
                unmarked.append(f"{path.relative_to(PKG.parent)}:{i + 1}")
    assert not unmarked, (
        "global window without a bounded-frame marker comment "
        f"(add `# {MARKER}: <why the frame is bounded>` above): {unmarked}"
    )
