"""Example API on the real 2dFLenS survey files.

When the prepared files are mounted (the reference package bundles them,
/root/reference/src/yaw/examples/), ``yet_another_wizz_tpu.examples`` must
serve them directly: committed parquet catalogs with the bundled patch
column, and the committed cross/auto/estimate products, all read through
this framework's two-way-compatible loaders.
"""

import importlib
from pathlib import Path

import numpy as np
import pytest
from numpy.testing import assert_allclose

REAL_DIR = Path("/root/reference/src/yaw/examples")

pytestmark = pytest.mark.skipif(
    not (REAL_DIR / "2dflens_kidss_data.pqt").exists(),
    reason="prepared 2dFLenS example files not available",
)


@pytest.fixture()
def examples(monkeypatch):
    monkeypatch.delenv("YAWT_EXAMPLE_FORCE_MOCK", raising=False)
    import yet_another_wizz_tpu.examples as examples

    examples = importlib.reload(examples)
    assert examples.USES_REAL_DATA
    yield examples
    # restore whatever state other tests expect
    importlib.reload(examples)


def test_paths_point_at_survey_files(examples):
    assert examples.PATH.data.name == "2dflens_kidss_data.pqt"
    assert examples.PATH.rand.name == "2dflens_kidss_rand_5x.pqt"
    assert examples.PATH.unknown == examples.PATH.data


def test_committed_products_load(examples):
    cross = examples.cross
    auto = examples.auto
    estimate = examples.estimate
    assert cross.num_patches == 11
    assert auto.num_patches == 11
    assert estimate.num_bins == 11
    assert np.all(np.isfinite(estimate.data))
    # reference-parity module attributes
    assert examples.normalised_counts is not None
    assert examples.patched_count.num_patches == 11
    assert examples.patched_sum_weights.num_patches == 11


def test_estimate_consistent_with_committed_corrfuncs(examples):
    """Recomputing the estimate from the committed cross/auto pair counts
    through this framework's resampling and estimator stack reproduces the
    committed estimate files."""
    from yet_another_wizz_tpu.redshifts import RedshiftData

    recomputed = RedshiftData.from_corrfuncs(examples.cross, examples.auto)
    committed = examples.estimate
    assert_allclose(recomputed.data, committed.data, rtol=1e-6)
    assert_allclose(recomputed.samples, committed.samples, rtol=1e-6)
    assert_allclose(recomputed.error, committed.error, rtol=1e-5)


def test_catalog_uses_bundled_patches(examples, tmp_path):
    data = examples.ExampleData.create_data_cat(tmp_path / "cache")
    assert data.num_patches == 11
    total = sum(p.meta.num_records for p in data.values())
    assert total == 21_875  # committed row count


def test_build_products_refuses_overwriting_committed(examples):
    examples.ExampleData.build_products()  # no-op
    with pytest.raises(RuntimeError, match="read-only"):
        examples.ExampleData.build_products(force=True)


class TestDownload:
    """`ExampleData.download_and_update`: reference-parity on-demand
    download (/root/reference/src/yaw/examples/__init__.py:146-170) with a
    graceful offline story. Exercised against an in-memory stand-in for
    the 2dFLenS server (this environment has no egress)."""

    @staticmethod
    def _fake_tarball(rng, n):
        """A tar.gz shaped like data_2df{lo,hi}z_kidss.tar.gz: a 'data'
        member and five 'randNNN' members of 2dFLenS-format ASCII."""
        import io
        import tarfile

        def ascii_table(rows):
            lines = ["# 2dFLenS", "# RA Dec redshift wei", "#"]
            for ra, dec, z, w in rows:
                lines.append(f"{ra:.6f} {dec:.6f} {z:.4f} {w:.3f}")
            return "\n".join(lines).encode()

        def rows(k):
            ra = rng.uniform(330.0, 360.0, k)
            dec = rng.uniform(-35.0, -25.0, k)
            z = rng.uniform(0.15, 0.7, k)
            w = rng.uniform(0.5, 2.0, k)
            return np.column_stack([ra, dec, z, w])

        payload = io.BytesIO()
        with tarfile.open(fileobj=payload, mode="w:gz") as tar:
            for name in ["data_sample.txt"] + [
                f"rand{i:03d}_sample.txt" for i in range(1, 6)
            ]:
                content = ascii_table(rows(n))
                info = tarfile.TarInfo(name)
                info.size = len(content)
                tar.addfile(info, io.BytesIO(content))
        payload.seek(0)
        return payload.getvalue()

    def test_download_and_update(self, monkeypatch, tmp_path):
        import importlib
        import io

        import pyarrow.parquet as pq

        import yet_another_wizz_tpu.examples as examples

        rng = np.random.default_rng(7)
        tarballs = {
            "lo": self._fake_tarball(rng, 40),
            "hi": self._fake_tarball(rng, 40),
        }

        class FakeResponse(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *args):
                return False

        def fake_urlopen(url, timeout=None):
            for key, blob in tarballs.items():
                if f"2df{key}z" in url:
                    return FakeResponse(blob)
            raise AssertionError(f"unexpected url {url}")

        monkeypatch.setenv("YAWT_EXAMPLE_DATA_DIR", str(tmp_path))
        monkeypatch.delenv("YAWT_EXAMPLE_FORCE_MOCK", raising=False)
        examples = importlib.reload(examples)
        try:
            # isolate from the mounted reference copy: simulate a user
            # without bundled files (only their empty data dir)
            monkeypatch.setattr(
                examples, "_search_dirs", lambda: [tmp_path]
            )
            monkeypatch.setattr(examples, "_BUNDLED_DIR", tmp_path / "x")
            examples._refresh_paths()
            assert not examples.USES_REAL_DATA  # tmp dir is empty
            import urllib.request

            monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
            target = examples.ExampleData.download_and_update()
            assert target == tmp_path

            # the example API switched to the downloaded survey files
            assert examples.USES_REAL_DATA
            assert examples.PATH.data == tmp_path / "2dflens_kidss_data.pqt"
            table = pq.read_table(examples.PATH.data)
            assert table.num_rows == 80  # lo + hi concatenated
            assert set(table.column_names) == {
                "RA", "Dec", "redshift", "wei", "patch"
            }
            rand = pq.read_table(examples.PATH.rand)
            assert rand.num_rows == 5 * 80  # five realisations each
            # patch ids index the 11 published centers
            patches = np.asarray(table["patch"])
            assert patches.min() >= 0 and patches.max() < 11
            # products are computed locally into a writable location
            assert not examples.PATH.cross.exists()
            assert examples.PATH.cross.parent != Path(
                "/root/reference/src/yaw/examples"
            )
        finally:
            monkeypatch.undo()
            importlib.reload(examples)

    def test_download_offline_raises_gracefully(self, monkeypatch, tmp_path):
        import importlib
        import urllib.error
        import urllib.request

        import yet_another_wizz_tpu.examples as examples

        def offline(url, timeout=None):
            raise urllib.error.URLError("no route to host")

        monkeypatch.setenv("YAWT_EXAMPLE_DATA_DIR", str(tmp_path))
        examples = importlib.reload(examples)
        try:
            monkeypatch.setattr(
                examples, "_search_dirs", lambda: [tmp_path]
            )
            examples._refresh_paths()
            monkeypatch.setattr(urllib.request, "urlopen", offline)
            with pytest.raises(RuntimeError, match="mock"):
                examples.ExampleData.download_and_update()
            # the mock path still works after the failed download
            assert not examples.USES_REAL_DATA
        finally:
            monkeypatch.undo()
            importlib.reload(examples)


def test_download_to_custom_target(monkeypatch, tmp_path):
    """download_and_update(target=...) registers the custom directory so
    the example API actually switches to the downloaded files."""
    import importlib

    import yet_another_wizz_tpu.examples as examples

    examples = importlib.reload(examples)
    try:
        monkeypatch.setattr(examples, "_BUNDLED_DIR", tmp_path / "nope")
        monkeypatch.delenv("YAWT_EXAMPLE_DATA_DIR", raising=False)
        monkeypatch.setenv("YAWT_EXAMPLE_CACHE", str(tmp_path / "cache"))
        examples._refresh_paths()

        rng = np.random.default_rng(7)
        blob = TestDownload._fake_tarball(rng, 20)
        import io
        import urllib.request

        class FakeResponse(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *args):
                return False

        monkeypatch.setattr(
            urllib.request, "urlopen",
            lambda url, timeout=None: FakeResponse(blob),
        )
        custom = tmp_path / "elsewhere"
        examples.ExampleData.download_and_update(custom)
        assert examples.USES_REAL_DATA
        assert examples.PATH.data.parent == custom
    finally:
        monkeypatch.undo()
        importlib.reload(examples)
