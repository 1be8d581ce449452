"""Generate docs/notebooks/*.ipynb from examples/*.py.

The reference ships its walkthroughs as Jupyter notebooks
(/root/reference/docs/notebooks); this repo's examples are runnable
scripts.  This script closes the FORMAT gap mechanically: each example
becomes a notebook whose first cell is the module docstring (markdown)
and whose code cells are the script's top-level blocks, split on blank
lines following function/flow boundaries (`# %%` markers split
explicitly when present).

Run:  python scripts/gen_notebooks.py        # writes docs/notebooks/
"""

import ast
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = ROOT / "examples"
OUT = ROOT / "docs" / "notebooks"


def split_cells(body: str):
    """Split on explicit `# %%` markers, else keep one code cell."""
    if "# %%" in body:
        cells, cur = [], []
        for line in body.splitlines():
            if line.startswith("# %%"):
                if cur:
                    cells.append("\n".join(cur).strip("\n"))
                cur = [line[4:].lstrip("# ")] if line[4:].strip() else []
            else:
                cur.append(line)
        if cur:
            cells.append("\n".join(cur).strip("\n"))
        return [c for c in cells if c]
    return [body.strip("\n")]


def convert(path: Path):
    src = path.read_text()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or path.stem
    # strip the module docstring from the code body
    first = tree.body[0]
    if (isinstance(first, ast.Expr)
            and isinstance(first.value, ast.Constant)
            and isinstance(first.value.value, str)):
        lines = src.splitlines()
        body = "\n".join(lines[first.end_lineno:])
    else:
        body = src

    title = doc.splitlines()[0].rstrip(".")
    md = f"# {title}\n\n" + "\n".join(doc.splitlines()[1:]).strip()
    cells = [{"cell_type": "markdown", "metadata": {},
              "source": md.splitlines(keepends=True)}]
    for chunk in split_cells(body):
        cells.append({"cell_type": "code", "metadata": {},
                      "execution_count": None, "outputs": [],
                      "source": chunk.splitlines(keepends=True)})
    nb = {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    out = OUT / (path.stem + ".ipynb")
    out.write_text(json.dumps(nb, indent=1))
    return out


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for path in sorted(EXAMPLES.glob("*.py")):
        print("wrote", convert(path))


if __name__ == "__main__":
    main()
