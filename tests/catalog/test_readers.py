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


def _fits_card(key, value, comment=""):
    if isinstance(value, str):
        text = f"{key:<8}= '{value}'"
    elif isinstance(value, bool):
        text = f"{key:<8}= {'T' if value else 'F':>20}"
    else:
        text = f"{key:<8}= {value:>20}"
    if comment:
        text += f" / {comment}"
    return f"{text:<80}"[:80]


def _fits_block(cards):
    text = "".join(cards) + f"{'END':<80}"
    pad = (2880 - len(text) % 2880) % 2880
    return (text + " " * pad).encode("ascii")


_TFORM_NUMPY = {
    "B": "u1", "I": ">i2", "J": ">i4", "K": ">i8", "E": ">f4", "D": ">f8",
}


def write_fits_table_typed(path, stored, *, tforms, extra_cards=()):
    """Hand-written FITS binary table with per-column TFORM codes and
    arbitrary extra header cards (TSCALn/TZEROn/TNULLn...), independent of
    the reader code. ``stored`` maps column name -> raw stored values."""
    names = list(stored)
    fields = []
    for name in names:
        code = tforms[name]
        repeat = int(code[:-1]) if code[:-1] else 1
        base = _TFORM_NUMPY[code[-1]]
        fields.append((name, base, (repeat,)) if repeat > 1 else (name, base))
    data = np.zeros(len(next(iter(stored.values()))), dtype=fields)
    for name in names:
        data[name] = stored[name]

    primary = _fits_block(
        [_fits_card("SIMPLE", True), _fits_card("BITPIX", 8),
         _fits_card("NAXIS", 0), _fits_card("EXTEND", True)]
    )
    table_cards = [
        _fits_card("XTENSION", "BINTABLE"), _fits_card("BITPIX", 8),
        _fits_card("NAXIS", 2), _fits_card("NAXIS1", data.dtype.itemsize),
        _fits_card("NAXIS2", len(data)), _fits_card("PCOUNT", 0),
        _fits_card("GCOUNT", 1), _fits_card("TFIELDS", len(names)),
    ]
    for i, name in enumerate(names, 1):
        table_cards.append(_fits_card(f"TTYPE{i}", name))
        table_cards.append(_fits_card(f"TFORM{i}", tforms[name]))
    for key, value in extra_cards:
        table_cards.append(_fits_card(key, value))
    raw = data.tobytes()
    pad = (2880 - len(raw) % 2880) % 2880
    with open(path, "wb") as f:
        f.write(primary)
        f.write(_fits_block(table_cards))
        f.write(raw + b"\x00" * pad)


def write_fits_table(path, columns):
    """Hand-written all-float64 FITS binary table."""
    write_fits_table_typed(
        path,
        {n: np.asarray(v, dtype=">f8") for n, v in columns.items()},
        tforms={n: "D" for n in columns},
    )


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


class TestFitsScaledColumns:
    """TSCAL/TZERO/TNULL semantics (the reference gets these from astropy's
    cfitsio; a scaled survey file must parse correctly, never silently
    wrong)."""

    def test_tscal_tzero_applied(self, tmp_path):
        path = tmp_path / "scaled.fits"
        # dec stored as signed 16-bit with physical = -90 + 0.01 * stored
        stored_dec = np.array([0, 4500, 9000, 18000], dtype=np.int16)
        ra = np.array([10.0, 20.0, 30.0, 40.0])
        write_fits_table_typed(
            path,
            dict(RA=ra.astype(">f8"), DEC=stored_dec),
            tforms=dict(RA="D", DEC="I"),
            extra_cards=[("TSCAL2", 0.01), ("TZERO2", -90.0)],
        )
        with FitsReader(path, ra_name="RA", dec_name="DEC") as reader:
            (chunk,) = list(reader)
        expect_dec = -90.0 + 0.01 * stored_dec
        assert_allclose(chunk["dec"], np.deg2rad(expect_dec), rtol=1e-12)
        assert_allclose(chunk["ra"], np.deg2rad(ra), rtol=1e-12)

    def test_unsigned_int_convention(self, tmp_path):
        # unsigned 16-bit stored as signed with TZERO = 32768
        path = tmp_path / "unsigned.fits"
        physical = np.array([0, 1, 32768, 65535], dtype=np.float64)
        stored = (physical - 32768).astype(np.int16)
        write_fits_table_typed(
            path,
            dict(RA=np.ones(4, dtype=">f8"), DEC=np.zeros(4, dtype=">f8"),
                 W=stored),
            tforms=dict(RA="D", DEC="D", W="I"),
            extra_cards=[("TZERO3", 32768)],
        )
        with FitsReader(
            path, ra_name="RA", dec_name="DEC", weight_name="W"
        ) as reader:
            (chunk,) = list(reader)
        assert_allclose(chunk["weights"], physical, rtol=0)

    def test_tnull_scaled_reads_when_no_nulls(self, tmp_path):
        path = tmp_path / "nulls_ok.fits"
        stored = np.array([5, 6, 7], dtype=np.int32)
        write_fits_table_typed(
            path,
            dict(RA=np.ones(3, dtype=">f8"), DEC=np.zeros(3, dtype=">f8"),
                 Z=stored),
            tforms=dict(RA="D", DEC="D", Z="J"),
            extra_cards=[("TNULL3", -999), ("TSCAL3", 0.1)],
        )
        with FitsReader(
            path, ra_name="RA", dec_name="DEC", redshift_name="Z"
        ) as reader:
            (chunk,) = list(reader)
        assert_allclose(chunk["redshifts"], [0.5, 0.6, 0.7], rtol=1e-12)

    def test_tnull_entries_rejected_loudly(self, tmp_path):
        path = tmp_path / "nulls.fits"
        stored = np.array([5, -999, 7], dtype=np.int32)
        write_fits_table_typed(
            path,
            dict(RA=np.ones(3, dtype=">f8"), DEC=np.zeros(3, dtype=">f8"),
                 Z=stored),
            tforms=dict(RA="D", DEC="D", Z="J"),
            extra_cards=[("TNULL3", -999), ("TSCAL3", 0.1)],
        )
        with FitsReader(
            path, ra_name="RA", dec_name="DEC", redshift_name="Z"
        ) as reader:
            with pytest.raises(ValueError, match="TNULL"):
                list(reader)

    def test_tnull_on_float_column_rejected(self, tmp_path):
        path = tmp_path / "badnull.fits"
        write_fits_table_typed(
            path,
            dict(RA=np.ones(2, dtype=">f8"), DEC=np.zeros(2, dtype=">f8")),
            tforms=dict(RA="D", DEC="D"),
            extra_cards=[("TNULL1", -1)],
        )
        with pytest.raises(ValueError, match="TNULL"):
            FitsReader(path, ra_name="RA", dec_name="DEC")

    def test_array_column_rejected_loudly(self, tmp_path):
        path = tmp_path / "array.fits"
        write_fits_table_typed(
            path,
            dict(RA=np.ones(3, dtype=">f8"),
                 DEC=np.zeros((3, 4), dtype=">f8")),
            tforms=dict(RA="D", DEC="4D"),
        )
        with FitsReader(path, ra_name="RA", dec_name="DEC") as reader:
            with pytest.raises(ValueError, match="array column"):
                list(reader)

    def test_unsupported_tform_rejected_at_open(self, tmp_path):
        path = tmp_path / "varlen.fits"
        write_fits_table(path, dict(RA=np.ones(2), DEC=np.zeros(2)))
        # swap a TFORM card to a variable-length descriptor
        raw = path.read_bytes()
        patched = raw.replace(
            b"TFORM2  = 'D'", b"TFORM2  = 'PD(8)'"
        )
        assert patched != raw
        path.write_bytes(patched)
        with pytest.raises(ValueError, match="unsupported FITS column"):
            FitsReader(path, ra_name="RA", dec_name="DEC")

    def test_missing_column_clear_error(self, columns, tmp_path):
        path = tmp_path / "cat.fits"
        write_fits_table(path, columns)
        with FitsReader(path, ra_name="RA", dec_name="NOPE") as reader:
            with pytest.raises(KeyError, match="available"):
                list(reader)


class TestFitsCrossValidation:
    """Re-encode the reference's committed 2dFLenS parquet as FITS with
    mixed storage types and check identical physical values come back."""

    REAL = "/root/reference/src/yaw/examples/2dflens_kidss_data.pqt"

    @pytest.mark.skipif(
        not __import__("pathlib").Path(REAL).exists(),
        reason="reference example data not available",
    )
    def test_reference_parquet_reencoded_as_fits(self, tmp_path):
        import pyarrow.parquet as pq

        table = pq.read_table(self.REAL)
        ra = np.asarray(table["RA"], dtype=np.float64)
        dec = np.asarray(table["Dec"], dtype=np.float64)
        z = np.asarray(table["redshift"], dtype=np.float64)
        wei = np.asarray(table["wei"], dtype=np.float64)

        # store dec scaled into 32-bit ints (exact: values quantised first)
        dec_scale, dec_zero = 1e-6, -90.0
        dec_stored = np.round((dec - dec_zero) / dec_scale).astype(np.int64)
        dec_quantised = dec_zero + dec_scale * dec_stored

        path = tmp_path / "2dflens.fits"
        write_fits_table_typed(
            path,
            dict(
                RA=ra.astype(">f8"),
                Dec=dec_stored.astype(">i8"),
                redshift=z.astype(">f4"),
                wei=wei.astype(">f8"),
            ),
            tforms=dict(RA="D", Dec="K", redshift="E", wei="D"),
            extra_cards=[("TSCAL2", dec_scale), ("TZERO2", dec_zero)],
        )
        with FitsReader(
            path, ra_name="RA", dec_name="Dec", redshift_name="redshift",
            weight_name="wei", chunksize=8192,
        ) as reader:
            chunks = list(reader)
        data = np.concatenate(chunks)
        assert len(data) == len(ra)
        assert_allclose(data["ra"], np.deg2rad(ra), rtol=1e-15)
        assert_allclose(data["dec"], np.deg2rad(dec_quantised), rtol=1e-15)
        assert_allclose(data["weights"], wei, rtol=1e-15)
        assert_allclose(data["redshifts"], z.astype(np.float32), rtol=1e-15)



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
