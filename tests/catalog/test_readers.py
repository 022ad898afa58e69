import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.catalog.readers import (
    DataFrameReader,
    FitsReader,
    HDFReader,
    ParquetReader,
    RandomReader,
    new_filereader,
)


@pytest.fixture
def columns(rng):
    n = 1000
    return dict(
        RA=rng.uniform(0, 360, n),
        DEC=rng.uniform(-90, 90, n),
        W=rng.uniform(0.5, 2, n),
        Z=rng.uniform(0.1, 2, n),
    )


NAMES = dict(ra_name="RA", dec_name="DEC", weight_name="W", redshift_name="Z")


def write_fits_table(path, columns):
    """Hand-written FITS binary table (independent of the reader code)."""

    def card(key, value, comment=""):
        if isinstance(value, str):
            text = f"{key:<8}= '{value}'"
        elif isinstance(value, bool):
            text = f"{key:<8}= {'T' if value else 'F':>20}"
        else:
            text = f"{key:<8}= {value:>20}"
        if comment:
            text += f" / {comment}"
        return f"{text:<80}"[:80]

    def block(cards):
        text = "".join(cards) + f"{'END':<80}"
        pad = (2880 - len(text) % 2880) % 2880
        return (text + " " * pad).encode("ascii")

    names = list(columns)
    data = np.zeros(
        len(columns[names[0]]), dtype=[(n, ">f8") for n in names]
    )
    for n in names:
        data[n] = columns[n]

    primary = block(
        [card("SIMPLE", True), card("BITPIX", 8), card("NAXIS", 0),
         card("EXTEND", True)]
    )
    table_cards = [
        card("XTENSION", "BINTABLE"), card("BITPIX", 8), card("NAXIS", 2),
        card("NAXIS1", data.dtype.itemsize), card("NAXIS2", len(data)),
        card("PCOUNT", 0), card("GCOUNT", 1), card("TFIELDS", len(names)),
    ]
    for i, n in enumerate(names, 1):
        table_cards.append(card(f"TTYPE{i}", n))
        table_cards.append(card(f"TFORM{i}", "D"))
    raw = data.tobytes()
    pad = (2880 - len(raw) % 2880) % 2880
    with open(path, "wb") as f:
        f.write(primary)
        f.write(block(table_cards))
        f.write(raw + b"\x00" * pad)


def check_reader(reader, columns, chunksize=None):
    chunks = list(reader)
    data = np.concatenate(chunks)
    assert reader.num_records == len(columns["RA"])
    assert_allclose(data["ra"], np.deg2rad(columns["RA"]), rtol=1e-12)
    assert_allclose(data["dec"], np.deg2rad(columns["DEC"]), rtol=1e-12)
    assert_allclose(data["weights"], columns["W"], rtol=1e-12)
    assert_allclose(data["redshifts"], columns["Z"], rtol=1e-12)
    if chunksize:
        assert len(chunks) == -(-reader.num_records // chunksize)


class TestDataFrameReader:
    def test_roundtrip(self, columns):
        import pandas as pd

        frame = pd.DataFrame(columns)
        with DataFrameReader(frame, **NAMES, chunksize=300) as reader:
            check_reader(reader, columns, 300)

    def test_probe(self, columns):
        import pandas as pd

        with DataFrameReader(pd.DataFrame(columns), **NAMES) as reader:
            probe = reader.get_probe(100)
        assert len(probe) == 100


class TestParquetReader:
    def test_roundtrip(self, columns, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = tmp_path / "cat.pqt"
        pq.write_table(
            pa.table({k: v for k, v in columns.items()}),
            path, row_group_size=256,
        )
        with ParquetReader(path, **NAMES, chunksize=300) as reader:
            check_reader(reader, columns, 300)


class TestHDFReader:
    def test_roundtrip(self, columns, tmp_path):
        import h5py

        path = tmp_path / "cat.hdf5"
        with h5py.File(path, "w") as f:
            for key, values in columns.items():
                f.create_dataset(key, data=values)
        with HDFReader(path, **NAMES, chunksize=300) as reader:
            check_reader(reader, columns, 300)

    def test_length_mismatch(self, columns, tmp_path):
        import h5py

        path = tmp_path / "bad.hdf5"
        with h5py.File(path, "w") as f:
            f.create_dataset("RA", data=columns["RA"])
            f.create_dataset("DEC", data=columns["DEC"][:10])
        with pytest.raises(ValueError, match="equal length"):
            HDFReader(path, ra_name="RA", dec_name="DEC")


class TestFitsReader:
    def test_roundtrip(self, columns, tmp_path):
        path = tmp_path / "cat.fits"
        write_fits_table(path, columns)
        with FitsReader(path, **NAMES, chunksize=300) as reader:
            check_reader(reader, columns, 300)

    def test_not_fits(self, tmp_path):
        path = tmp_path / "junk.fits"
        path.write_bytes(b"definitely not a fits file")
        with pytest.raises(ValueError, match="not a FITS"):
            FitsReader(path, ra_name="RA", dec_name="DEC")

    def test_truncated_data_section(self, columns, tmp_path):
        path = tmp_path / "trunc.fits"
        write_fits_table(path, columns)
        size = path.stat().st_size
        with open(path, "r+b") as f:
            f.truncate(size - 8192)
        with FitsReader(path, **NAMES) as reader:
            with pytest.raises(ValueError, match="truncated"):
                list(reader)



class TestRandomReader:
    def test_generator_chunks(self):
        from yet_another_wizz_tpu.randoms import BoxRandoms

        generator = BoxRandoms(10, 30, -5, 5, seed=1)
        with RandomReader(generator, 1000, chunksize=256) as reader:
            data = np.concatenate(list(reader))
        assert len(data) == 1000
        assert data["ra"].min() >= np.deg2rad(10)


class TestDispatch:
    def test_extension_dispatch(self, tmp_path):
        with pytest.raises(ValueError, match="extension"):
            new_filereader(tmp_path / "cat.txt")

    def test_dispatch_parquet(self, columns, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = tmp_path / "cat.parquet"
        pq.write_table(pa.table(dict(columns)), path)
        with new_filereader(path, **NAMES) as reader:
            assert isinstance(reader, ParquetReader)


class TestPrefetch:
    def test_prefetch_preserves_order_and_content(self, columns):
        import pandas as pd

        from yet_another_wizz_tpu.catalog.readers import prefetch_chunks

        frame = pd.DataFrame(columns)
        with DataFrameReader(frame, **NAMES, chunksize=128) as reader:
            direct = list(reader)
            prefetched = list(prefetch_chunks(reader, depth=2))
        assert len(direct) == len(prefetched)
        for a, b in zip(direct, prefetched):
            assert np.array_equal(a, b)

    def test_prefetch_propagates_errors(self):
        class Broken:
            num_chunks = 3

            def __iter__(self):
                yield np.zeros(2)
                raise RuntimeError("boom")

        from yet_another_wizz_tpu.catalog.readers import prefetch_chunks

        with pytest.raises(RuntimeError, match="boom"):
            list(prefetch_chunks(Broken()))


class TestCsvReader:
    def test_roundtrip(self, columns, tmp_path):
        import pandas as pd

        from yet_another_wizz_tpu.catalog.readers import CsvReader

        path = tmp_path / "cat.csv"
        pd.DataFrame(columns).to_csv(path, index=False)
        with CsvReader(path, **NAMES, chunksize=300) as reader:
            check_reader(reader, columns, 300)

    def test_dispatch(self, columns, tmp_path):
        import pandas as pd

        from yet_another_wizz_tpu.catalog.readers import CsvReader

        path = tmp_path / "cat.csv"
        pd.DataFrame(columns).to_csv(path, index=False)
        with new_filereader(path, **NAMES) as reader:
            assert isinstance(reader, CsvReader)
