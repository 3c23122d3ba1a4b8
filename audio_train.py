#!/usr/bin/env python
"""Train CLI (reference: audio_train.py:33-163).

    python audio_train.py --conf-dir=configs/dprnn_wsj0.yml [--lr 5e-4 ...]

Config → registries → AudioSystem → explicit TPU Trainer.  Every YAML leaf
is a CLI flag (utils/parser_utils reflection).  Artifacts land in
``Experiments/checkpoint/<exp_name>/`` (conf.yml, top-5 + last ckpts,
best_k_models.json, best_model.pth), logs in
``Experiments/tensorboard_logs/<exp_name>``.
"""

import argparse
import os

import yaml

import audio_only_speech_separation_tpu.data as datas
import audio_only_speech_separation_tpu.losses as losses
import audio_only_speech_separation_tpu.models as models
from audio_only_speech_separation_tpu.parallel import local_shard_info, make_mesh
from audio_only_speech_separation_tpu.train import (
    AudioSystem,
    Trainer,
    make_optimizer,
    make_scheduler,
)
from audio_only_speech_separation_tpu.utils import (
    parse_args_as_dict,
    prepare_parser_from_dict,
    print_only,
)


# Optional warm-start hook set by audio_train_twostep.py:
# a (pretrained_params, merge_fn) pair applied after parameter init.
WARM_START = None


def build_loss(loss_conf: dict):
    wrapper_cls = losses.get(loss_conf["loss_func"])
    sdr = losses.get(loss_conf["sdr_type"])
    return wrapper_cls(sdr, **(loss_conf.get("config") or {}))


def main(config):
    import jax

    print_only("Instantiating datamodule <{}>".format(config["datamodule"]["data_name"]))
    shard_id, num_shards = local_shard_info()
    # config batch_size is PER-DEVICE (the reference's batch_size is per-GPU
    # under DDP, audio_train.py:126); the host loader assembles the local
    # global batch = per-device × local device count
    data_config = dict(config["datamodule"]["data_config"])
    n_local = jax.local_device_count()
    data_config["batch_size"] = data_config.get("batch_size", 1) * n_local
    datamodule = datas.get(config["datamodule"]["data_name"])(
        **data_config,
        shard_id=shard_id,
        num_shards=num_shards,
    )
    datamodule.setup()
    train_loader, val_loader, test_loader = datamodule.make_loader

    print_only("Instantiating AudioNet <{}>".format(config["audionet"]["audionet_name"]))
    model_cls = models.get(config["audionet"]["audionet_name"])
    model = model_cls(
        sample_rate=config["datamodule"]["data_config"]["sample_rate"],
        **(config["audionet"]["audionet_config"] or {}),
    )

    print_only("Instantiating optimizer <{}>".format(config["optimizer"]["optim_name"]))
    optimizer = make_optimizer(
        optim_name=config["optimizer"]["optim_name"],
        lr=config["optimizer"]["lr"],
        weight_decay=config["optimizer"].get("weight_decay", 0.0),
        grad_clip=5.0,  # Lightning gradient_clip_val=5.0 (audio_train.py:123)
    )

    scheduler = None
    if config.get("scheduler") and config["scheduler"].get("sche_name"):
        print_only("Instantiating scheduler <{}>".format(config["scheduler"]["sche_name"]))
        scheduler = make_scheduler(
            config["scheduler"]["sche_name"],
            lr=config["optimizer"]["lr"],
            **(config["scheduler"].get("sche_config") or {}),
        )

    # experiment dir + config snapshot (reference audio_train.py:59-63)
    exp_dir = os.path.join(
        os.getcwd(), "Experiments", "checkpoint", config["exp"]["exp_name"]
    )
    os.makedirs(exp_dir, exist_ok=True)
    config["main_args"] = dict(config.get("main_args") or {})
    config["main_args"]["exp_dir"] = exp_dir
    with open(os.path.join(exp_dir, "conf.yml"), "w") as f:
        yaml.safe_dump(config, f, default_flow_style=False)

    print_only("Instantiating losses <{}>".format(config["loss"]["train"]["loss_func"]))
    loss_func = {
        "train": build_loss(config["loss"]["train"]),
        "val": build_loss(config["loss"]["val"]),
    }

    system = AudioSystem(
        audio_model=model,
        loss_func=loss_func,
        optimizer=optimizer,
        train_loader=train_loader,
        val_loader=val_loader,
        test_loader=test_loader,
        scheduler=scheduler,
        config=config,
    )
    if WARM_START is not None:
        system.warm_start = WARM_START

    logger_dir = os.path.join(
        os.getcwd(), "Experiments", "tensorboard_logs", config["exp"]["exp_name"]
    )
    trainer = Trainer(
        exp_dir=exp_dir,
        epochs=config["training"]["epochs"],
        early_stop=config["training"].get("early_stop"),
        mesh=make_mesh(),
        logger_dir=logger_dir,
        checkpoint={"monitor": "val_loss/dataloader_idx_0", "mode": "min", "save_top_k": 5},
        precision=config["training"].get("precision", "float32"),
        remat=bool(config["training"].get("remat", False)),
        fused_forward=bool(config["training"].get("fused_forward", False)),
    )
    trainer.fit(system)
    print_only(f"Training finished; artifacts in {exp_dir}")


def maybe_init_distributed():
    """Multi-host DP bootstrap — the explicit replacement for Lightning's
    hidden DDP process-group init (reference audio_train.py:120-132).

    Env-gated so single-host runs are untouched.  Set
    ``JAX_COORDINATOR_ADDRESS`` (host:port of process 0) plus
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` to launch one process per
    host; on TPU pods with cluster auto-detection the address alone
    suffices.  Must run before any other JAX API touches the backend.
    Checkpoints/logs are written by process 0 only — point ``exp_dir`` at a
    shared filesystem if resume-after-preemption must work from any host.
    """
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    print_only(
        f"Distributed: {jax.process_count()} processes, "
        f"{jax.device_count()} global devices"
    )


if __name__ == "__main__":
    maybe_init_distributed()
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--conf-dir",
        default="configs/dprnn_wsj0.yml",
        help="Full path to save best validation model",
    )
    args, _ = parser.parse_known_args()
    with open(args.conf_dir) as f:
        def_conf = yaml.safe_load(f)
    parser = prepare_parser_from_dict(def_conf, parser=parser)
    arg_dic, plain_args = parse_args_as_dict(parser, return_plain_args=True)
    # reassemble the nested config with CLI overrides applied
    config = {}
    for group, leaves in arg_dic.items():
        if group == "main_args":
            config["main_args"] = leaves
            continue
        config[group] = leaves
    # restore the two-level nesting the groups flattened
    for group in def_conf:
        if group not in config:
            config[group] = def_conf[group]
    main(config)
