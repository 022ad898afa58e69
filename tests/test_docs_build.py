"""The documentation site build: one command renders the markdown tree
(the counterpart of the reference's buildable Sphinx docs,
/root/reference/docs/source/conf.py)."""

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _build_docs_module():
    spec = importlib.util.spec_from_file_location(
        "build_docs", REPO / "scripts" / "build_docs.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_docs_site_builds_and_links_resolve(tmp_path):
    build_docs = _build_docs_module()
    site = build_docs.build_site(tmp_path / "site")

    pages = sorted(site.rglob("*.html"))
    names = {p.relative_to(site).as_posix() for p in pages}
    assert "index.html" in names
    assert "user_guide/getting_started.html" in names
    assert "user_guide/tutorial.html" in names
    assert "api/index.html" in names
    assert len(pages) >= 25  # user guide + design + generated API pages

    # every page carries the navigation and rendered content
    index = (site / "index.html").read_text(encoding="utf-8")
    assert "<nav" in index and "yet_another_wizz_tpu" in index

    # code blocks are highlighted, tables rendered
    tutorial = (site / "user_guide/tutorial.html").read_text(encoding="utf-8")
    assert '<pre class="highlight">' in tutorial

    # no internal link points at a missing target and none still end in .md
    assert build_docs.check_links(site) == []
    for page in pages:
        assert '.md"' not in page.read_text(encoding="utf-8")


def test_docs_build_cli(tmp_path):
    import subprocess
    import sys

    result = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "build_docs.py"),
            "--out", str(tmp_path / "cli_site"),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert result.returncode == 0, result.stderr
    assert (tmp_path / "cli_site" / "index.html").exists()
