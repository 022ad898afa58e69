"""The code examples in the user guide must actually run.

Extracts ``python`` code blocks from the docs and executes them against
generated input files (guards the docs against API drift)."""

import re
from pathlib import Path

import numpy as np
import pytest

DOCS = Path(__file__).parent.parent / "docs"


def python_blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.fixture(scope="module")
def example_files(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yet_another_wizz_tpu.examples import generate_mock_data

    root = tmp_path_factory.mktemp("docs_example")
    mock = generate_mock_data(
        num_reference=1500, num_unknown=2000, num_randoms=4000, seed=7
    )
    names = {"reference": "reference", "randoms": "randoms",
             "unknown": "unknown"}
    for key, stem in names.items():
        sample = mock[key]
        cols = dict(
            RA=np.rad2deg(sample["ra"]), Dec=np.rad2deg(sample["dec"])
        )
        if sample.get("redshifts") is not None:
            cols["z"] = sample["redshifts"]
        pq.write_table(pa.table(cols), root / f"{stem}.pqt")
    return root


def test_getting_started_measurement(example_files, tmp_path, monkeypatch):
    blocks = python_blocks(DOCS / "user_guide" / "getting_started.md")
    assert blocks, "no python examples found"
    code = blocks[0]
    # smaller patch count for the miniature catalogs; headless plotting
    code = code.replace("patch_num=64", "patch_num=4")
    code = code.replace("num_bins=11", "num_bins=4")
    code = code.replace("nz.plot()", "")
    monkeypatch.chdir(example_files)
    namespace = {}
    exec(compile(code, "getting_started.md", "exec"), namespace)
    nz = namespace["nz"]
    assert np.all(np.isfinite(nz.data))
    assert (example_files / "nz_estimate.dat").exists()


def test_remaining_python_blocks_compile():
    """Every other python example must at least be valid syntax (the
    generated API reference holds signature blocks, not code)."""
    count = 0
    for path in DOCS.rglob("*.md"):
        if path.is_relative_to(DOCS / "api"):
            continue
        for block in python_blocks(path):
            compile(block, str(path), "exec")
            count += 1
    assert count >= 2
