"""Notebook-to-script conversion + cleanup (dev utility).

Equivalent of the reference's `LSPE/utils/cleaner_main.py`: the LSPE
codebase authors its mains as Jupyter notebooks and ships a cleaner
that nbconvert-exports them and strips the notebook-mode scaffolding.
This version needs no jupyter install — `.ipynb` files are plain JSON,
so conversion is a stdlib parse — and applies the same cleanup passes
(cleaner_main.py line refs inline):

  - drop `# In[..]` cell markers and comment lines      (:27-31)
  - remove the `in_ipynb()` helper and its call sites    (:33-40)
  - unindent the `if notebook_mode==False:` body          (:42-50)
  - delete `if notebook_mode...` blocks at 0 and 1 indent (:52-66)
  - normalize `def main(...)` to terminal form + call     (:68-74)
  - drop notebook-only variables (use_gpu/gpu_id/device/
    MODEL_NAME)                                           (:76-89)
"""

from __future__ import annotations

import json
from typing import List, Optional


def notebook_to_lines(ipynb_path: str) -> List[str]:
    """Code cells of a .ipynb, concatenated like `nbconvert --to script`
    (cell marker comment + blank separators)."""
    with open(ipynb_path) as f:
        nb = json.load(f)
    lines: List[str] = []
    for i, cell in enumerate(nb.get("cells", [])):
        if cell.get("cell_type") != "code":
            continue
        lines.append(f"# In[{i}]:\n")
        src = cell.get("source", [])
        if isinstance(src, str):
            src = src.splitlines(keepends=True)
        lines.extend(line if line.endswith("\n") else line + "\n"
                     for line in src)
        lines.append("\n")
    return lines


def _block_end(lines: List[str], start: int, indent: str) -> int:
    """Index of the last line of the suite opened at `start` (lines that
    are blank or begin with `indent` belong to the suite)."""
    i = start + 1
    while i < len(lines) and (lines[i][:len(indent)] in ("\n", indent)
                              or lines[i] == "\n"):
        i += 1
    return i - 1


def clean_script_lines(lines: List[str]) -> List[str]:
    lines = [ln for ln in lines if "# In[" not in ln]
    lines = [ln for ln in lines if not ln.startswith("#")]

    # remove the in_ipynb() helper definition, then its call sites
    idx = next((i for i, ln in enumerate(lines) if "def in_ipynb" in ln),
               None)
    if idx is not None:
        end = _block_end(lines, idx, "    ")
        lines = lines[:idx] + lines[end + 1:]
    lines = [ln for ln in lines
             if "in_ipynb()" not in ln and "print(notebook_mode)" not in ln]

    # unindent the `if notebook_mode==False:` body and drop the header
    idx = next((i for i, ln in enumerate(lines)
                if "if notebook_mode==False" in ln), None)
    if idx is not None:
        end = _block_end(lines, idx, "        ")
        for i in range(idx + 1, end + 1):
            lines[i] = lines[i][4:] if lines[i] != "\n" else lines[i]
        lines.pop(idx)
    lines = [ln for ln in lines
             if "# notebook mode" not in ln and "# terminal mode" not in ln]

    # remaining notebook_mode blocks at 0 and 1 indentation levels
    for prefix, indent in (("if notebook_mode", "    "),
                           ("    if notebook_mode", "        ")):
        while True:
            idx = next((i for i, ln in enumerate(lines)
                        if ln.startswith(prefix)), None)
            if idx is None:
                break
            end = _block_end(lines, idx, indent)
            lines = lines[:idx] + lines[end + 1:]

    # terminal-mode main()
    idx = next((i for i, ln in enumerate(lines) if "def main" in ln), None)
    if idx is not None:
        lines[idx] = "def main():\n"
    idx = next((i for i, ln in enumerate(lines)
                if ln.startswith("else:")), None)
    if idx is not None:
        lines.pop(idx)
    idx = next((i for i, ln in enumerate(lines)
                if ln.startswith("    main()")), None)
    if idx is not None:
        lines[idx] = "main()\n"

    # notebook-only variables
    for marker in ("use_gpu = True", "gpu_id = -1", "device = None"):
        idx = next((i for i, ln in enumerate(lines) if marker in ln), None)
        if idx is not None:
            lines.pop(idx)
    lines = [ln for ln in lines if not ln.startswith("MODEL_NAME")]
    return lines


def clean_notebook_main(ipynb_path: str,
                        out_path: Optional[str] = None) -> str:
    """Convert `<name>.ipynb` to a cleaned `<name>.py`; returns the
    output path (the reference's `cleaner_main(filename)` entry)."""
    lines = clean_script_lines(notebook_to_lines(ipynb_path))
    out_path = out_path or ipynb_path.rsplit(".ipynb", 1)[0] + ".py"
    with open(out_path, "w") as f:
        f.write("".join(lines))
    return out_path
