#!/usr/bin/env python
"""Zero-dependency docs renderer — the local fallback for the mkdocs
build (.github/workflows/build_docs.yaml; reference analog: the Sphinx
site built by its build_docs.yaml).

This environment has no mkdocs/sphinx installed, so "the docs render"
must be provable without them: this script converts every markdown page
under docs/ (plus the repo README) to standalone HTML with a shared nav,
using only the standard library.  It supports the subset of markdown the
docs actually use — headings, fenced code, inline code, lists, tables,
links, bold/italic — and FAILS (exit 1) on broken relative links, so it
doubles as a render-level check the plain consistency pass
(scripts/check_docs.py) does not do.

    python scripts/build_docs.py [--out site_fallback]
"""

from __future__ import annotations

import argparse
import html
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAGES = [("README.md", "Overview")] + [
    (os.path.join("docs", f), None)
    for f in ["README.md", "architecture.md", "api.md", "performance.md",
              "distribution.md"]
]

_INLINE = [
    (re.compile(r"`([^`]+)`"), lambda m: f"<code>{html.escape(m.group(1))}</code>"),
    (re.compile(r"\*\*([^*]+)\*\*"), lambda m: f"<strong>{m.group(1)}</strong>"),
    (re.compile(r"\[([^\]]+)\]\(([^)\s]+)\)"),
     lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>'),
]


def _inline(text: str) -> str:
    # protect code spans first (escape inside them), then links/bold
    out = html.escape(text, quote=False)
    # un-escape the markers we interpret
    out = out.replace("&amp;", "&")
    for rx, sub in _INLINE:
        out = rx.sub(sub, out)
    return out


def md_to_html(src: str) -> tuple[str, str, list[str]]:
    """Returns (html_body, first_h1, relative_link_targets)."""
    lines = src.splitlines()
    out, links = [], []
    title = ""
    in_code = False
    in_list = False
    in_table = False
    for raw in lines:
        line = raw.rstrip("\n")
        if line.startswith("```"):
            if in_code:
                out.append("</pre>")
            else:
                out.append("<pre>")
            in_code = not in_code
            continue
        if in_code:
            out.append(html.escape(line))
            continue
        for m in re.finditer(r"\]\(([^)\s#]+)(?:#[^)]*)?\)", line):
            t = m.group(1)
            if not t.startswith(("http://", "https://", "mailto:")):
                links.append(t)
        if line.startswith("|"):
            cells = [c.strip() for c in line.strip("|").split("|")]
            if all(re.fullmatch(r":?-+:?", c) for c in cells if c):
                continue  # separator row
            if not in_table:
                out.append("<table>")
                in_table = True
            out.append(
                "<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in cells)
                + "</tr>"
            )
            continue
        elif in_table:
            out.append("</table>")
            in_table = False
        m = re.match(r"(#{1,6})\s+(.*)", line)
        if m:
            if in_list:
                out.append("</ul>")
                in_list = False
            level = len(m.group(1))
            if level == 1 and not title:
                title = m.group(2)
            out.append(f"<h{level}>{_inline(m.group(2))}</h{level}>")
            continue
        m = re.match(r"\s*[-*]\s+(.*)", line)
        if m:
            if not in_list:
                out.append("<ul>")
                in_list = True
            out.append(f"<li>{_inline(m.group(1))}</li>")
            continue
        if in_list and not line.strip():
            out.append("</ul>")
            in_list = False
            continue
        if not line.strip():
            out.append("")
            continue
        out.append(f"<p>{_inline(line)}</p>")
    if in_list:
        out.append("</ul>")
    if in_table:
        out.append("</table>")
    if in_code:
        raise ValueError("unterminated code fence")
    return "\n".join(out), title, links


_STYLE = """
body{font-family:sans-serif;max-width:56rem;margin:2rem auto;padding:0 1rem;
     line-height:1.5}
pre{background:#f5f5f5;padding:.8rem;overflow-x:auto}
code{background:#f5f5f5;padding:0 .2rem}
table{border-collapse:collapse}td{border:1px solid #ccc;padding:.3rem .6rem}
nav a{margin-right:1rem}
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="site_fallback")
    args = ap.parse_args()
    out_dir = os.path.join(ROOT, args.out)
    os.makedirs(out_dir, exist_ok=True)

    nav_items = []
    rendered = []
    broken = []
    for rel, label in PAGES:
        path = os.path.join(ROOT, rel)
        with open(path) as f:
            body, title, links = md_to_html(f.read())
        name = os.path.basename(rel).replace(".md", ".html")
        if rel == "README.md":
            name = "index.html"
        elif rel == os.path.join("docs", "README.md"):
            name = "docs_index.html"
        nav_items.append((name, label or title or rel))
        rendered.append((name, label or title or rel, body))
        base = os.path.dirname(path)
        for t in links:
            tgt = os.path.normpath(os.path.join(base, t))
            if not os.path.exists(tgt):
                broken.append(f"{rel}: broken relative link -> {t}")

    nav = "<nav>" + "".join(
        f'<a href="{n}">{html.escape(t)}</a>' for n, t in nav_items
    ) + "</nav><hr/>"
    for name, title, body in rendered:
        page = (f"<!doctype html><html><head><meta charset='utf-8'>"
                f"<title>{html.escape(title)}</title>"
                f"<style>{_STYLE}</style></head><body>{nav}{body}"
                f"</body></html>")
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(page)

    if broken:
        print("\n".join(broken), file=sys.stderr)
        return 1
    print(f"rendered {len(rendered)} pages -> {out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
