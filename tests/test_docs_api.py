"""The generated API reference must cover every public symbol and be
current (regeneration reproduces the committed files)."""

import importlib
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs" / "api"


@pytest.fixture(scope="module")
def generator():
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import gen_api_docs
    finally:
        sys.path.pop(0)
    return gen_api_docs


def test_every_public_symbol_documented(generator):
    text = "\n".join(
        p.read_text() for p in DOCS.glob("*.md")
    )
    missing = []
    for module_path in generator.MODULES:
        module = importlib.import_module(module_path)
        for name in generator.public_names(module):
            obj = getattr(module, name)
            if getattr(obj, "__class__", None).__name__ == "module":
                continue
            if f"### `{name}`" not in text:
                missing.append(f"{module_path}.{name}")
    assert not missing, f"undocumented public symbols: {missing}"


def test_generated_docs_are_current(generator, tmp_path):
    fresh = generator.generate(tmp_path)
    for name, content in fresh.items():
        committed = DOCS / name
        assert committed.exists(), f"missing docs/api/{name}"
        assert committed.read_text() == content, (
            f"docs/api/{name} is stale; regenerate with "
            "'python scripts/gen_api_docs.py'"
        )
    # no orphaned files either
    orphans = {p.name for p in DOCS.glob("*.md")} - set(fresh)
    assert not orphans, f"orphaned generated docs: {orphans}"


def test_top_level_all_complete(generator):
    import yet_another_wizz_tpu as yawt

    text = (DOCS / "yawt.md").read_text()
    for name in yawt.__all__:
        if name.startswith("__"):
            continue  # __version__ etc.
        assert f"### `{name}`" in text, name
