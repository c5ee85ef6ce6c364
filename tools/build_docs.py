"""Static documentation site builder — the analog of the reference's
Literate/Documenter pipeline (`/root/reference/docs/make.jl:1-37`), built on
the in-image `markdown` + `pygments` packages (no pip).

* renders every ``docs/*.md`` page to ``site/<name>.html`` with a shared
  nav sidebar, fenced-code highlighting, and tables;
* literate-renders every ``examples/*.py`` (module docstring + code blocks,
  the Literate.jl analog) to ``site/examples/<name>.html``;
* writes ``site/index.html`` from quickstart.

Run: ``python tools/build_docs.py`` → ``site/`` (self-contained, no JS).
CI runs it in the docs job so a broken cross-reference fails the build.
"""

from __future__ import annotations

import ast
import html
import re
import sys
from pathlib import Path

import markdown
from pygments.formatters import HtmlFormatter

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"
EXAMPLES = REPO / "examples"
SITE = REPO / "site"

PAGES = [
    ("quickstart", "Quickstart"),
    ("concepts", "Concepts"),
    ("tutorials", "Tutorials"),
    ("api", "API reference"),
    ("benchmarks", "Benchmarks"),
    ("scaling", "Scaling"),
]

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 0; display: flex; color: #1a1a1a; }
nav { width: 220px; min-height: 100vh; background: #f6f8fa;
      padding: 1.2rem; box-sizing: border-box; flex-shrink: 0; }
nav h1 { font-size: 1rem; }
nav a { display: block; padding: .25rem 0; color: #0957d0;
        text-decoration: none; }
nav a.current { font-weight: 600; color: #1a1a1a; }
main { max-width: 54rem; padding: 2rem 3rem; box-sizing: border-box; }
pre { background: #f6f8fa; padding: .8rem 1rem; overflow-x: auto;
      border-radius: 6px; font-size: .85rem; }
code { font-family: ui-monospace, 'SF Mono', Menlo, monospace;
       font-size: .9em; }
table { border-collapse: collapse; }
td, th { border: 1px solid #d0d7de; padding: .3rem .6rem; }
h1, h2, h3 { scroll-margin-top: 1rem; }
"""


def _md() -> markdown.Markdown:
    return markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )


def _nav(current: str, depth: int = 0) -> str:
    prefix = "../" * depth
    items = [
        f'<a href="{prefix}{slug}.html"'
        f'{" class=current" if slug == current else ""}>{title}</a>'
        for slug, title in PAGES
    ]
    ex_links = "".join(
        f'<a href="{prefix}examples/{p.stem}.html"'
        f'{" class=current" if p.stem == current else ""}>{p.stem}</a>'
        for p in sorted(EXAMPLES.glob("*.py"))
    )
    return (
        f'<nav><h1><a href="{prefix}index.html">directtrajopt_tpu</a></h1>'
        + "".join(items)
        + "<h1>Examples</h1>"
        + ex_links
        + "</nav>"
    )


def _page(title: str, body: str, current: str, depth: int = 0) -> str:
    hilite = HtmlFormatter(nowrap=False).get_style_defs(".codehilite")
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)} — directtrajopt_tpu</title>"
        f"<style>{CSS}\n{hilite}</style></head><body>"
        f"{_nav(current, depth)}<main>{body}</main></body></html>"
    )


def _render_example(path: Path) -> str:
    """Literate rendering: module docstring as prose, the rest as one
    highlighted code block (the Literate.jl analog for our examples)."""
    src = path.read_text()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or path.stem
    body_src = src
    if (
        tree.body
        and isinstance(tree.body[0], ast.Expr)
        and isinstance(tree.body[0].value, ast.Constant)
    ):
        body_src = "\n".join(src.splitlines()[tree.body[0].end_lineno:])
    md = _md()
    prose = md.convert(doc)
    code = md.convert(f"```python\n{body_src.strip()}\n```")
    return f"<h1>{html.escape(path.stem)}</h1>{prose}{code}"


def _check_links(pages: dict[str, str]) -> list[str]:
    """Internal-link check — the Documenter-style 'broken xref fails the
    build' behavior."""
    errors = []
    known = set(pages) | {
        f"examples/{p.stem}" for p in EXAMPLES.glob("*.py")
    }
    for slug, html_text in pages.items():
        for m in re.finditer(r'href="([^"#]+)\.html"', html_text):
            target = m.group(1).removeprefix("../")
            if target not in known and target != "index":
                errors.append(f"{slug}: broken link to {target}.html")
    return errors


def main() -> int:
    SITE.mkdir(exist_ok=True)
    (SITE / "examples").mkdir(exist_ok=True)
    rendered: dict[str, str] = {}
    for slug, title in PAGES:
        md = _md()
        body = md.convert((DOCS / f"{slug}.md").read_text())
        page = _page(title, body, slug)
        (SITE / f"{slug}.html").write_text(page)
        rendered[slug] = page
    for p in sorted(EXAMPLES.glob("*.py")):
        page = _page(p.stem, _render_example(p), p.stem, depth=1)
        (SITE / "examples" / f"{p.stem}.html").write_text(page)
        rendered[f"examples/{p.stem}"] = page
    (SITE / "index.html").write_text(rendered["quickstart"])
    errors = _check_links(rendered)
    for e in errors:
        print(f"ERROR: {e}", file=sys.stderr)
    n = len(rendered) + 1
    print(f"site/: {n} pages rendered, {len(errors)} broken links")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
