#!/usr/bin/env python3
"""Generate per-tool documentation (docs/tools/<Tool>.md + index).

Mirrors the reference's doc layout (/root/reference/doc/tools/<Tool>.md:
"### <Tool> tool help" followed by the tool's own --help output). Run from
the repo root:

    python tools/gen_docs.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("NGSHOST_DISABLE", "")


def main():
    from ngsbits_tpu.tools import TOOL_MODULES, get_tool

    out_dir = REPO / "docs" / "tools"
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for name in sorted(TOOL_MODULES):
        try:
            tool = get_tool(name)()
            tool.setup()
        except Exception as e:  # tools must all be instantiable
            print(f"ERROR instantiating {name}: {e}", file=sys.stderr)
            raise
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            tool.print_help()
        help_text = buf.getvalue().rstrip("\n")
        indented = "\n".join("\t" + l for l in help_text.split("\n"))
        md = f"### {name} tool help\n{indented}\n"
        if tool.changelog:
            md += f"\n### {name} changelog\n"
            for (y, m, d, text) in tool.changelog:
                md += f"\t{y}-{m:02d}-{d:02d} {text}\n"
        md += "\n[back to tool index](index.md)\n"
        (out_dir / f"{name}.md").write_text(md)
        rows.append((name, tool.description))

    index = ["# Tool index", "",
             "One page per CLI tool, generated from each tool's `--help` "
             "output (`python tools/gen_docs.py`). Invoke any tool as "
             "`python -m ngsbits_tpu <Tool> [args]`.", "",
             "| Tool | Description |", "|---|---|"]
    for name, desc in rows:
        index.append(f"| [{name}]({name}.md) | {desc} |")
    (out_dir / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(rows)} tool pages to {out_dir}")


if __name__ == "__main__":
    main()
