"""Notebook-fidelity audit: extract every `from desilike... import ...` and
`desilike.<attr>` use from the reference's example notebooks and user docs,
map `desilike` -> `desilike_tpu`, and check each imported name resolves.

This is the closest in-container proxy to "a reference user's scripts keep
working" — the notebooks are the reference's de-facto tutorial surface.

Usage: python scripts/notebook_audit.py
"""
import json
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_NB = '/root/reference/nb'
REF_DOCS = '/root/reference/docs'

IMPORT_RE = re.compile(
    r'^\s*from\s+(desilike[\w.]*)\s+import\s+([^#\n]+)', re.MULTILINE)

# names referencing things deliberately out of scope (documented):
# clik wrappers, downloads, mpi.
ACCEPTED = {'CurrentMPIComm'}


def code_cells():
    out = []
    for fn in glob.glob(os.path.join(REF_NB, '*.ipynb')):
        try:
            nb = json.load(open(fn))
        except Exception:
            continue
        for cell in nb.get('cells', []):
            if cell.get('cell_type') == 'code':
                out.append((os.path.basename(fn), ''.join(cell.get('source', []))))
    for fn in glob.glob(os.path.join(REF_DOCS, '**', '*.rst'), recursive=True):
        out.append((os.path.relpath(fn, REF_DOCS), open(fn).read()))
    return out


def main():
    import importlib
    missing = {}
    n_total = n_ok = 0
    for src, code in code_cells():
        for match in IMPORT_RE.finditer(code):
            module, names = match.group(1), match.group(2)
            module = module.replace('desilike', 'desilike_tpu', 1)
            names = [n.strip().split(' as ')[0] for n in names.replace('(', '').replace(')', '').split(',')]
            names = [n for n in names if n and n != '\\']
            try:
                mod = importlib.import_module(module)
            except Exception as exc:
                for n in names:
                    missing.setdefault(f'{module} (module: {type(exc).__name__})', set()).add(n)
                n_total += len(names)
                continue
            for n in names:
                if n in ACCEPTED:
                    continue
                n_total += 1
                if getattr(mod, n, None) is not None:
                    n_ok += 1
                else:
                    missing.setdefault(module, set()).add((n, src))
    print(f'{n_ok}/{n_total} notebook/doc imports resolve')
    for mod in sorted(missing):
        print(f'  {mod}: {sorted(missing[mod])}')
    return n_total - n_ok


if __name__ == '__main__':
    main()
