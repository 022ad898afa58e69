#!/usr/bin/env python3
"""Build the rendered documentation site from the markdown tree.

The reference ships a buildable Sphinx tree
(/root/reference/docs/source/conf.py); this is the equivalent deliverable
for this package, self-contained on the libraries baked into the image
(markdown-it-py for CommonMark+tables, pygments for code highlighting —
no sphinx/mkdocs available here, and installing packages is not an
option). One command renders ``docs/**/*.md`` into a static HTML site:

    python scripts/build_docs.py [--out docs/_site]

Features: GitHub-flavoured tables, fenced code blocks with syntax
highlighting, heading anchors, relative ``*.md`` links rewritten to
``*.html``, a sidebar navigation derived from ``docs/index.md``, and a
light/dark-aware stylesheet. ``tests/test_docs_build.py`` builds the site
and checks structure and link integrity.
"""

from __future__ import annotations

import argparse
import re
import shutil
import sys
from pathlib import Path

from markdown_it import MarkdownIt
from pygments import highlight
from pygments.formatters import HtmlFormatter
from pygments.lexers import TextLexer, get_lexer_by_name
from pygments.util import ClassNotFound

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"

PAGE_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — yet_another_wizz_tpu</title>
<style>
{style}
</style>
</head>
<body>
<nav class="sidebar">
<p class="brand"><a href="{root}index.html">yet_another_wizz_tpu</a></p>
{nav}
</nav>
<main class="content">
{body}
</main>
</body>
</html>
"""

STYLE = """
:root {
  --bg: #ffffff; --fg: #1a1a2e; --muted: #5a5a72; --accent: #0b5fa5;
  --border: #e2e2ea; --code-bg: #f6f6fa;
}
@media (prefers-color-scheme: dark) {
  :root {
    --bg: #14141c; --fg: #e4e4ee; --muted: #9a9ab2; --accent: #6cb2f0;
    --border: #2c2c3a; --code-bg: #1e1e2a;
  }
}
* { box-sizing: border-box; }
body {
  margin: 0; display: flex; background: var(--bg); color: var(--fg);
  font: 16px/1.6 system-ui, -apple-system, "Segoe UI", sans-serif;
}
.sidebar {
  width: 270px; min-width: 270px; padding: 1.2rem; height: 100vh;
  position: sticky; top: 0; overflow-y: auto;
  border-right: 1px solid var(--border); font-size: 0.86rem;
}
.sidebar .brand { font-weight: 700; font-size: 1rem; }
.sidebar ul { list-style: none; padding-left: 0.9rem; margin: 0.2rem 0; }
.sidebar a { color: var(--muted); text-decoration: none; }
.sidebar a:hover, .sidebar a.active { color: var(--accent); }
.content { max-width: 56rem; padding: 1.5rem 2.5rem 4rem; min-width: 0; }
a { color: var(--accent); }
h1, h2, h3 { line-height: 1.25; }
h2 { border-bottom: 1px solid var(--border); padding-bottom: 0.25rem; }
code, pre {
  font: 0.88em/1.5 ui-monospace, "SF Mono", Menlo, Consolas, monospace;
}
code { background: var(--code-bg); padding: 0.1em 0.3em; border-radius: 4px; }
pre {
  background: var(--code-bg); border: 1px solid var(--border);
  border-radius: 8px; padding: 0.8rem 1rem; overflow-x: auto;
}
pre code { background: none; padding: 0; }
table { border-collapse: collapse; display: block; overflow-x: auto; }
th, td { border: 1px solid var(--border); padding: 0.35rem 0.7rem; }
th { background: var(--code-bg); }
blockquote {
  margin: 0; padding: 0.2rem 1rem; border-left: 3px solid var(--accent);
  color: var(--muted);
}
@media (prefers-color-scheme: dark) {
  .highlight .k, .highlight .kn { color: #c792ea; }
  .highlight .s, .highlight .s1, .highlight .s2 { color: #c3e88d; }
  .highlight .c1, .highlight .c { color: #697098; }
  .highlight .n, .highlight .nn { color: #e4e4ee; }
  .highlight .mi, .highlight .mf { color: #f78c6c; }
}
"""


def _slugify(text: str) -> str:
    text = re.sub(r"[^\w\s-]", "", text.lower())
    return re.sub(r"[\s]+", "-", text).strip("-")


def _highlight_code(code: str, lang: str, attrs) -> str:
    try:
        lexer = get_lexer_by_name(lang or "text")
    except ClassNotFound:
        lexer = TextLexer()
    formatter = HtmlFormatter(nowrap=True)
    return (
        '<pre class="highlight"><code>'
        + highlight(code, lexer, formatter)
        + "</code></pre>\n"
    )


def _make_renderer() -> MarkdownIt:
    md = MarkdownIt("commonmark", {"highlight": _highlight_code})
    md.enable("table")
    md.enable("strikethrough")
    return md


def _rewrite_links(tokens, page_dir: Path) -> None:
    """Rewrite relative ``*.md`` targets to the rendered ``*.html``."""
    for token in tokens:
        if token.children:
            _rewrite_links(token.children, page_dir)
        if token.type != "link_open":
            continue
        href = token.attrGet("href") or ""
        if "://" in href or href.startswith("#"):
            continue
        path, _, anchor = href.partition("#")
        if path.endswith(".md"):
            token.attrSet(
                "href", path[:-3] + ".html" + (f"#{anchor}" if anchor else "")
            )


def _add_heading_anchors(html: str) -> str:
    def repl(match):
        level, body = match.group(1), match.group(2)
        slug = _slugify(re.sub(r"<[^>]+>", "", body))
        return f'<h{level} id="{slug}">{body}</h{level}>'

    return re.sub(r"<h([1-6])>(.*?)</h\1>", repl, html, flags=re.S)


def _page_title(source: str, fallback: str) -> str:
    match = re.search(r"^#\s+(.+)$", source, flags=re.M)
    return match.group(1).strip() if match else fallback


def _nav_html(pages: list[Path], active: Path) -> str:
    """Sidebar: the user guide/design/API tree grouped by directory."""
    groups: dict[str, list[Path]] = {}
    for page in pages:
        rel = page.relative_to(DOCS)
        group = rel.parts[0] if len(rel.parts) > 1 else ""
        groups.setdefault(group, []).append(page)
    order = ["", "user_guide", "design", "api"]
    titles = {
        "": "Overview",
        "user_guide": "User guide",
        "design": "Design",
        "api": "API reference",
    }
    root = _root_prefix(active)
    parts = []
    for group in sorted(groups, key=lambda g: (order.index(g) if g in order else 99, g)):
        parts.append(f"<p><strong>{titles.get(group, group)}</strong></p><ul>")
        for page in sorted(groups[group]):
            rel = page.relative_to(DOCS).with_suffix(".html")
            title = _page_title(
                page.read_text(encoding="utf-8"), page.stem
            )
            cls = ' class="active"' if page == active else ""
            parts.append(f'<li><a href="{root}{rel}"{cls}>{title}</a></li>')
        parts.append("</ul>")
    return "\n".join(parts)


def _root_prefix(page: Path) -> str:
    depth = len(page.relative_to(DOCS).parts) - 1
    return "../" * depth


def build_site(out_dir: Path | str | None = None) -> Path:
    out = Path(out_dir) if out_dir else DOCS / "_site"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    md = _make_renderer()
    pages = sorted(p for p in DOCS.rglob("*.md") if out not in p.parents)
    for page in pages:
        source = page.read_text(encoding="utf-8")
        tokens = md.parse(source)
        _rewrite_links(tokens, page.parent)
        body = _add_heading_anchors(md.renderer.render(tokens, md.options, {}))
        html = PAGE_TEMPLATE.format(
            title=_page_title(source, page.stem),
            style=STYLE,
            nav=_nav_html(pages, page),
            root=_root_prefix(page),
            body=body,
        )
        dest = out / page.relative_to(DOCS).with_suffix(".html")
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(html, encoding="utf-8")
    return out


def check_links(site: Path) -> list[str]:
    """Internal link integrity of the rendered site (broken targets)."""
    broken = []
    for page in site.rglob("*.html"):
        html = page.read_text(encoding="utf-8")
        for href in re.findall(r'href="([^"]+)"', html):
            if "://" in href or href.startswith("#") or href.startswith("mailto:"):
                continue
            target = (page.parent / href.partition("#")[0]).resolve()
            if not target.exists():
                broken.append(f"{page.relative_to(site)} -> {href}")
    return broken


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=None, help="output directory")
    args = parser.parse_args()
    site = build_site(args.out)
    pages = len(list(site.rglob("*.html")))
    broken = check_links(site)
    print(f"rendered {pages} pages -> {site}")
    if broken:
        print("broken internal links:", file=sys.stderr)
        for item in broken:
            print(f"  {item}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
