"""Config system tests (SURVEY.md §4, build stage 1): YAML→argparse
round-trip, CLI overrides with type inference, and that every shipped
config instantiates its model/loss/scheduler."""

import glob

import pytest
import yaml

import audio_only_speech_separation_tpu.losses as losses
import audio_only_speech_separation_tpu.models as models
import audio_only_speech_separation_tpu.data as datas
from audio_only_speech_separation_tpu.train import make_optimizer, make_scheduler
from audio_only_speech_separation_tpu.utils import (
    parse_args_as_dict,
    prepare_parser_from_dict,
    str2bool,
    str_int_float,
)

EXAMPLE = {
    "optimizer": {"optim_name": "adam", "lr": 0.001, "weight_decay": 0},
    "training": {"epochs": 500, "parallel": "ddp"},
    "exp": {"exp_name": "demo"},
}


class TestParserReflection:
    def test_round_trip_defaults(self):
        parser = prepare_parser_from_dict(EXAMPLE)
        out = parse_args_as_dict(parser, args=[])
        assert out["optimizer"]["lr"] == 0.001
        assert out["training"]["epochs"] == 500
        assert out["exp"]["exp_name"] == "demo"
        assert "main_args" in out

    def test_cli_override_with_type_inference(self):
        parser = prepare_parser_from_dict(EXAMPLE)
        out = parse_args_as_dict(parser, args=["--lr", "0.5", "--epochs", "7"])
        assert out["optimizer"]["lr"] == 0.5 and isinstance(out["optimizer"]["lr"], float)
        assert out["training"]["epochs"] == 7 and isinstance(out["training"]["epochs"], int)

    def test_bool_coercion(self):
        parser = prepare_parser_from_dict({"g": {"flag": True}})
        out = parse_args_as_dict(parser, args=["--flag", "false"])
        assert out["g"]["flag"] is False

    def test_str2bool_and_str_int_float(self):
        assert str2bool("yes") is True and str2bool("0") is False
        assert str2bool("hello") == "hello"
        assert str_int_float("3") == 3
        assert str_int_float("3.5") == 3.5
        assert str_int_float("x") == "x"

    def test_nested_dict_override(self):
        parser = prepare_parser_from_dict(
            {"audionet": {"audionet_name": "TasNet", "audionet_config": {"win": 16}}}
        )
        out = parse_args_as_dict(parser, args=["--audionet_config", "{'win': 32}"])
        assert out["audionet"]["audionet_config"]["win"] == 32


class TestShippedConfigs:
    @pytest.mark.parametrize("path", sorted(glob.glob("configs/*.yml")))
    def test_config_instantiates(self, path):
        with open(path) as f:
            cfg = yaml.safe_load(f)
        # model class + ctor args resolve
        cls = models.get(cfg["audionet"]["audionet_name"])
        model = cls(
            sample_rate=cfg["datamodule"]["data_config"]["sample_rate"],
            **(cfg["audionet"]["audionet_config"] or {}),
        )
        # loss wrappers resolve
        for split in ("train", "val"):
            lc = cfg["loss"][split]
            wrapper = losses.get(lc["loss_func"])(
                losses.get(lc["sdr_type"]), **(lc.get("config") or {})
            )
        # optimizer + scheduler resolve
        make_optimizer(cfg["optimizer"]["optim_name"], lr=cfg["optimizer"]["lr"])
        make_scheduler(
            cfg["scheduler"]["sche_name"],
            lr=cfg["optimizer"]["lr"],
            **(cfg["scheduler"].get("sche_config") or {}),
        )
        # datamodule class resolves
        datas.get(cfg["datamodule"]["data_name"])
        assert cfg["training"]["system"] == "AudioLightningModule"
