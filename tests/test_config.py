import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.config import ConfigError, Configuration
from yet_another_wizz_tpu.cosmology import Planck15


class TestConfigurationCreate:
    def test_minimal(self):
        config = Configuration.create(
            rmin=100, rmax=1000, zmin=0.1, zmax=1.0, num_bins=10
        )
        assert config.scales.num_scales == 1
        assert config.binning.num_bins == 10
        assert config.cosmology is Planck15

    def test_multi_scale(self):
        config = Configuration.create(
            rmin=[100, 500], rmax=[500, 1500], zmin=0.1, zmax=1.0
        )
        assert config.scales.num_scales == 2

    def test_custom_edges(self):
        config = Configuration.create(
            rmin=100, rmax=1000, edges=[0.1, 0.4, 0.9]
        )
        assert config.binning.num_bins == 2
        assert str(config.binning.method) == "custom"
        assert_allclose(config.binning.binning.edges, [0.1, 0.4, 0.9])

    def test_binning_methods(self):
        for method in ("linear", "comoving", "logspace"):
            config = Configuration.create(
                rmin=100, rmax=1000, zmin=0.1, zmax=1.0, num_bins=5,
                method=method,
            )
            assert len(config.binning.binning) == 5

    def test_missing_scales(self):
        with pytest.raises(ConfigError):
            Configuration.create(zmin=0.1, zmax=1.0)

    def test_missing_binning(self):
        with pytest.raises(ConfigError, match="zmin"):
            Configuration.create(rmin=100, rmax=1000)

    def test_inverted_scales(self):
        with pytest.raises(ConfigError):
            Configuration.create(rmin=1000, rmax=100, zmin=0.1, zmax=1.0)

    def test_inverted_binning(self):
        with pytest.raises(ConfigError, match="zmin"):
            Configuration.create(rmin=100, rmax=1000, zmin=1.0, zmax=0.1)

    def test_bad_unit(self):
        with pytest.raises(ConfigError, match="unit"):
            Configuration.create(
                rmin=100, rmax=1000, unit="lightyears", zmin=0.1, zmax=1.0
            )

    def test_bad_method(self):
        with pytest.raises(ConfigError, match="method"):
            Configuration.create(
                rmin=100, rmax=1000, zmin=0.1, zmax=1.0, method="magic"
            )

    def test_unknown_cosmology(self):
        with pytest.raises(ConfigError, match="cosmology"):
            Configuration.create(
                rmin=100, rmax=1000, zmin=0.1, zmax=1.0, cosmology="Narnia"
            )


class TestConfigurationDictYaml:
    def setup_method(self):
        self.config = Configuration.create(
            rmin=100, rmax=1000, zmin=0.1, zmax=1.0, num_bins=8,
            rweight=-1.0, resolution=20, closed="left",
        )

    def test_dict_roundtrip(self):
        clone = Configuration.from_dict(self.config.to_dict())
        assert clone == self.config

    def test_yaml_roundtrip(self, tmp_path):
        self.config.to_file(tmp_path / "config.yml")
        clone = Configuration.from_file(tmp_path / "config.yml")
        assert clone == self.config

    def test_unknown_key_rejected(self):
        bad = self.config.to_dict()
        bad["scales"]["spam"] = 1
        with pytest.raises(ConfigError, match="scales"):
            Configuration.from_dict(bad)

    def test_attribute_path_in_error(self):
        bad = self.config.to_dict()
        bad["binning"]["zmin"] = 2.0
        bad["binning"]["zmax"] = 1.0
        with pytest.raises(ConfigError, match="binning"):
            Configuration.from_dict(bad)

    def test_modify(self):
        changed = self.config.modify(num_bins=12)
        assert changed.binning.num_bins == 12
        assert changed.scales == self.config.scales
        assert self.config.binning.num_bins == 8  # unchanged

    def test_modify_edges(self):
        changed = self.config.modify(edges=[0.2, 0.5, 0.9])
        assert changed.binning.num_bins == 2


def test_get_paramspec():
    """Parameter metadata is introspectable (reference API,
    /root/reference/src/yaw/config/base.py:423-425)."""
    from yet_another_wizz_tpu.config import Configuration
    from yet_another_wizz_tpu.config.classes import BinningConfig, ScalesConfig

    spec = Configuration.get_paramspec()
    assert spec["scales"] is ScalesConfig
    assert spec["binning"] is BinningConfig
    assert "cosmology" in spec and "max_workers" in spec

    scales_spec = ScalesConfig.get_paramspec()
    assert {"rmin", "rmax", "unit", "rweight", "resolution"} <= set(scales_spec)
    assert scales_spec["unit"].help  # parameters carry metadata


class TestCountingKnob:
    """`scales.counting` selects the device counting formulation."""

    def test_round_trip_and_validation(self):
        from yet_another_wizz_tpu import Configuration
        from yet_another_wizz_tpu.config import ConfigError

        config = Configuration.create(
            rmin=100, rmax=1000, unit="kpc", zmin=0.1, zmax=1.0,
            num_bins=3, rweight=-1.0, resolution=32, counting="direct",
        )
        assert config.scales.counting == "direct"
        restored = Configuration.from_dict(config.to_dict())
        assert restored.scales.counting == "direct"
        assert config.modify(counting="cumulative").scales.counting == (
            "cumulative"
        )
        with pytest.raises(ConfigError, match="counting"):
            Configuration.create(
                rmin=100, rmax=1000, unit="kpc", zmin=0.1, zmax=1.0,
                num_bins=3, counting="direct",  # no rweight
            )
        with pytest.raises(ConfigError, match="counting"):
            Configuration.create(
                rmin=100, rmax=1000, unit="kpc", zmin=0.1, zmax=1.0,
                num_bins=3, counting="bogus",
            )

    def test_reaches_edge_tables(self):
        from yet_another_wizz_tpu import Configuration
        from yet_another_wizz_tpu.ops.thresholds import build_angular_edges

        kwargs = dict(
            rmin=100, rmax=1000, unit="kpc", zmin=0.1, zmax=1.0,
            num_bins=3, rweight=-1.0, resolution=32,
        )
        for counting, has_direct in (
            ("auto", True), ("cumulative", False), ("direct", True),
        ):
            config = Configuration.create(**kwargs, counting=counting)
            edges = build_angular_edges(
                config.scales.scales,
                config.binning.binning.mids,
                config.cosmology,
                weight_scale=config.scales.rweight,
                weight_res=config.scales.resolution,
                counting=config.scales.counting,
            )
            assert (edges.direct is not None) is has_direct


class TestReferenceParityMembers:
    """Reference members on the config machinery: sub-config file round
    trips, is_custom, Parameter.has_choices/to_type/format_yaml_doc
    (/root/reference/src/yaw/config/base.py:143-292, classes.py:345-356)."""

    def test_subconfig_file_roundtrip(self, tmp_path):
        from yet_another_wizz_tpu.config import BinningConfig, ScalesConfig

        binning = BinningConfig.create(zmin=0.1, zmax=1.0, num_bins=7)
        binning.to_file(tmp_path / "binning.yml")
        assert BinningConfig.from_file(tmp_path / "binning.yml") == binning

        scales = ScalesConfig.create(rmin=[100, 500], rmax=[500, 1500])
        scales.to_file(tmp_path / "scales.yml")
        assert ScalesConfig.from_file(tmp_path / "scales.yml") == scales

    def test_is_custom(self):
        from yet_another_wizz_tpu.config import BinningConfig

        assert BinningConfig.create(edges=[0.1, 0.5, 0.9]).is_custom
        assert not BinningConfig.create(zmin=0.1, zmax=1.0).is_custom

    def test_parameter_has_choices_and_to_type(self):
        from yet_another_wizz_tpu.config.base import ConfigError, Parameter

        plain = Parameter("x", "a value", float, default=1.0)
        assert not plain.has_choices
        chosen = Parameter(
            "y", "an option", str, default="a", choices=("a", "b")
        )
        assert chosen.has_choices
        with pytest.raises(ConfigError, match="allowed"):
            chosen.parse("c")

        doubled = Parameter("z", "doubled", float, to_type=lambda v: 2.0 * v)
        assert doubled.parse(3) == 6.0

    def test_parameter_format_yaml_doc(self):
        from yet_another_wizz_tpu.config.base import Parameter

        line = Parameter(
            "unit", "unit of the scales", str, default="kpc",
            choices=("kpc", "Mpc"),
        ).format_yaml_doc()
        assert line.startswith("unit: kpc")
        assert "unit of the scales" in line and "kpc, Mpc" in line

        required = Parameter("zmin", "lowest edge", float).format_yaml_doc()
        assert required.startswith("zmin: ") and "required" in required
