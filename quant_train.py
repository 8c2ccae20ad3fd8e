#!/usr/bin/env python
"""I-ViT QAT fine-tuning CLI (TPU-native).

Preserves the reference's public surface and defaults
(/root/reference/quant_train.py:23-138: --model/--data/--epochs/--lr,
epochs 90, lr 1e-6, batch 128, adamw, cosine, min_lr forced to lr/15,
DeiT augmentation recipe) — re-implemented on JAX: the train step is a
jit-compiled pure function running the integer simulation graph with STE;
the batch is sharded over the ``data`` axis of a device mesh, so the
gradient all-reduce the reference's (dormant) DDP would do rides ICI via
GSPMD (SURVEY.md §2.5).

Example:
    python quant_train.py --model deit_tiny --data /path/to/imagenet \
        --epochs 30 --lr 5e-7
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_parser():
    p = argparse.ArgumentParser("I-ViT QAT (TPU)")
    p.add_argument("--model", default="deit_tiny",
                   help="deit_tiny|deit_small|deit_base|vit_base|vit_large|"
                        "swin_tiny|swin_small|swin_base")
    p.add_argument("--data", metavar="DIR", default="/dataset/imagenet/")
    p.add_argument("--data-set", default="IMNET",
                   choices=["CIFAR100", "IMNET", "SYNTHETIC"])
    p.add_argument("--nb-classes", default=1000, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--print-freq", default=1000, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--output-dir", type=str, default="results/")
    p.add_argument("--resume", default="")
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("--batch-size", default=128, type=int)
    p.add_argument("--epochs", default=90, type=int)
    p.add_argument("--num-workers", default=8, type=int)
    # regularization
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--drop-path", type=float, default=0.1)
    # EMA
    p.add_argument("--model-ema", action="store_true")
    p.add_argument("--model-ema-decay", type=float, default=0.99996)
    # optimizer
    p.add_argument("--opt", default="adamw", type=str)
    p.add_argument("--opt-eps", default=1e-8, type=float)
    p.add_argument("--opt-betas", default=None, type=float, nargs="+")
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    # schedule
    p.add_argument("--sched", default="cosine", type=str)
    p.add_argument("--lr", type=float, default=1e-6)
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--min-lr", type=float, default=5e-7)
    p.add_argument("--warmup-epochs", type=int, default=0)
    # augmentation
    p.add_argument("--color-jitter", type=float, default=0.4)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--train-interpolation", type=str, default="bicubic")
    p.add_argument("--repeated-aug", action="store_true")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--loader-procs", action="store_true",
                   help="spawn worker PROCESSES for the input pipeline "
                        "(sidesteps the GIL on multi-core hosts; the "
                        "torch-DataLoader analogue)")
    p.add_argument("--min-crop-scale", type=float, default=0.08,
                   help="RandomResizedCrop lower scale bound")
    p.add_argument("--remode", type=str, default="pixel")
    p.add_argument("--recount", type=int, default=1)
    # mixup / cutmix
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--mixup-prob", type=float, default=1.0)
    p.add_argument("--mixup-switch-prob", type=float, default=0.5)
    p.add_argument("--mixup-mode", type=str, default="batch")
    p.add_argument("--best-acc1", type=float, default=0)
    # TPU-native extras
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel axis size (data axis gets the rest)")
    p.add_argument("--seq-parallel", action="store_true",
                   help="Megatron-style sequence parallelism: shard the "
                        "token axis over the model axis at block boundaries "
                        "(value-identical, tests/test_sp.py; ViT family, "
                        "needs --mesh-model > 1)")
    p.add_argument("--pipe", type=int, default=1,
                   help="pipeline-parallel stages: shard the block trunk "
                        "over a (data, pipe) mesh, GPipe schedule "
                        "(parallel/pipeline.py; forward bit-identical to "
                        "sequential, tests/test_pipeline.py). FROZEN-RANGE "
                        "finetune semantics: activation ranges do not EMA-"
                        "update and the step graph is deterministic (no "
                        "dropout/drop-path), so populate ranges first via "
                        "--calib-batches or --resume. ViT family; depth "
                        "must divide by the stage count; exclusive with "
                        "--mesh-model/--seq-parallel/--zero1; optimizer "
                        "state restarts fresh (not carried from --resume)")
    p.add_argument("--pipe-microbatches", type=int, default=0,
                   help="GPipe microbatches per step (0 = auto: the "
                        "largest M <= 2*pipe dividing the batch evenly "
                        "over the data axis)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1 analogue: shard AdamW moments + the EMA "
                        "copy over the data axis (cuts the 3x-model "
                        "optimizer memory by the DP degree; step math "
                        "unchanged, tests/test_zero1.py)")
    p.add_argument("--pretrained", type=str, default="",
                   help="path to a torch/npz checkpoint to import, or "
                        "'auto' to fetch the reference's published "
                        "checkpoint for --model (needs network)")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace of steps [10, 10+N) "
                        "of epoch 0 into <output-dir>/profile")
    p.add_argument("--max-steps-per-epoch", type=int, default=0,
                   help="truncate each epoch after N steps (smoke tests)")
    p.add_argument("--eval", action="store_true",
                   help="evaluate only (with --resume or --pretrained); "
                        "no training")
    p.add_argument("--dump-logits", default="",
                   help="with --eval: save per-image simulator logits + "
                        "labels to this .npz (val order is sequential, "
                        "so the file aligns image-for-image with "
                        "evaluate_accuracy --dump-logits for sim↔engine "
                        "per-image comparison)")
    p.add_argument("--calib-batches", type=int, default=0,
                   help="before eval/training, run N train batches with "
                        "EMA range updates to calibrate activation scales "
                        "(needed when importing float checkpoints)")
    p.add_argument("--fast-matmul", action="store_true",
                   help="bits-aware matmul precision tiers: forward stays "
                        "integer-exact, backward sees bf16-rounded grads; "
                        "4.2x faster QAT on v5e (220->926 img/s DeiT-S)")
    p.add_argument("--window-size", type=int, default=7,
                   help="Swin window size (every stage resolution must "
                        "divide by it, as in the reference)")
    p.add_argument("--softmax-bits", type=int, default=16,
                   choices=(8, 16),
                   help="ViT attention-probability precision: 16 = the "
                        "reference's QAT spec; 8 = the precision its "
                        "deployed TVM graph runs (int8 probs + pure "
                        "int8 attn@V) — faster deploy, sim stays "
                        "bit-exact with the engine either way")
    p.add_argument("--gelu-stable", action="store_true",
                   help="elementwise-stable ShiftGELU (no row-max "
                        "reduce; one exp chain per element). Value-"
                        "different from the reference's spec, equally "
                        "or more accurate; recorded in the artifact so "
                        "deploy runs the same formulation")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() from the "
                        "cluster env (the init_distributed_mode analogue, "
                        "/root/reference/utils/utils.py:215-237); the input "
                        "pipeline shards by process, the mesh spans all hosts")
    return p


def check_resume_spec(extra: dict, ckpt_meta: dict, model_name: str):
    """The same spec guard convert_model applies, at --resume/--eval
    time: the checkpoint records the spec-level model properties it was
    trained under (softmax_bits, gelu_stable, geometry); resuming it
    into a differently-built model is shape-compatible (the pytree
    loads fine) but silently value-wrong — scales trained for one
    integer formulation evaluated under another. Raise loudly and say
    which flags to pass. Pre-metadata checkpoints (no recorded keys)
    skip the check."""
    for key, built in ckpt_meta.items():
        recorded = extra.get(key)
        if (key == "softmax_bits" and recorded == 16
                and model_name.startswith("swin")):
            # legacy false record: swin checkpoints written before this
            # guard recorded the (ignored) ViT flag default, not the
            # model's true 8-bit spec
            continue
        if recorded is not None and recorded != built:
            raise SystemExit(
                f"--resume checkpoint was trained with {key}="
                f"{recorded!r} but this run builds the model with "
                f"{key}={built!r}. Pass the matching flags (the "
                f"checkpoint records: "
                + ", ".join(f"{k}={extra[k]!r}" for k in ckpt_meta
                            if extra.get(k) is not None)
                + ")."
            )


def main(argv=None):
    args = build_parser().parse_args(argv)
    # The reference forces min_lr = lr/15 (quant_train.py:202).
    args.min_lr = args.lr / 15.0

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ivit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from ivit_tpu.data import build_dataset, build_dataloaders
    from ivit_tpu.models import create_model
    from ivit_tpu.parallel import (
        data_sharding,
        make_mesh,
        param_shardings,
        seq_constraint,
        zero1_shardings,
    )
    from ivit_tpu.train import (
        cosine_schedule,
        create_train_state,
        make_eval_step,
        make_train_step,
        mixup_cutmix,
    )
    from ivit_tpu.train.augment import MixupConfig
    from ivit_tpu.utils import MetricLogger, load_checkpoint, save_checkpoint
    from ivit_tpu.utils.metrics import AverageMeter

    os.makedirs(args.output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(args.output_dir, "log.log")),
        ],
        force=True,
    )
    logging.info(str(args))

    if args.fast_matmul:
        import ivit_tpu.nn.quant as _q

        _q.SIM_FAST_MATMUL = True

    if args.distributed:
        jax.distributed.initialize()
        logging.info(
            "distributed: process %d/%d, %d devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )

    np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    ds_train = build_dataset(args.data_set, args.data, True,
                             args.input_size, args.nb_classes)
    ds_val = build_dataset(args.data_set, args.data, False,
                           args.input_size, args.nb_classes)
    train_loader, val_loader = build_dataloaders(
        args, ds_train, ds_val,
        num_shards=jax.process_count(), shard=jax.process_index(),
    )

    model_kwargs = dict(
        num_classes=args.nb_classes,
        img_size=args.input_size,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
    )
    if args.model.startswith("swin"):
        model_kwargs["window_size"] = args.window_size
    elif args.softmax_bits != 16:
        model_kwargs["softmax_bits"] = args.softmax_bits
    if args.gelu_stable:
        model_kwargs["gelu_stable"] = True
    model = create_model(args.model, **model_kwargs)
    if args.pipe > 1:
        if args.model.startswith("swin"):
            raise SystemExit(
                "--pipe supports the ViT family only: the Swin trunk is "
                "stage-heterogeneous (resolutions halve and dims double "
                "at each PatchMerging), so its blocks do not stack into "
                "one shardable depth axis"
            )
        if args.mesh_model > 1 or args.seq_parallel or args.zero1:
            raise SystemExit(
                "--pipe is exclusive with --mesh-model/--seq-parallel/"
                "--zero1: the pipeline manages its own (data, pipe) mesh"
            )
        if model.depth % args.pipe:
            raise SystemExit(
                f"--pipe {args.pipe} does not divide {args.model}'s "
                f"depth {model.depth}"
            )
        if not args.eval and not (args.resume or args.calib_batches > 0):
            raise SystemExit(
                "--pipe runs frozen-range finetune semantics (EMA range "
                "updates are sequential-batch semantics; see "
                "parallel/pipeline.py): populate activation ranges first "
                "with --calib-batches N or --resume a trained checkpoint"
            )
    mesh = make_mesh(model=args.mesh_model)
    if args.seq_parallel:
        if args.mesh_model > 1 and hasattr(model, "act_constraint"):
            model = model.clone(act_constraint=seq_constraint(mesh))
            logging.info(
                "sequence parallelism: token axis over the %d-way "
                "model axis", args.mesh_model,
            )
        else:
            logging.warning(
                "--seq-parallel ignored (needs --mesh-model > 1 and a "
                "ViT-family model)"
            )
    # Recorded in every checkpoint so convert_model can reconstruct the
    # EXACT model the scales were trained for — softmax_bits/gelu_stable
    # are spec-level model properties, and silently freezing a
    # mismatched artifact would degrade accuracy with no error.
    # Swin's probability precision is fixed at 8 by spec (models/swin.py
    # hardcodes IntSoftmax(out_bits=8), matching the reference's
    # swin_quant); --softmax-bits is a ViT knob, so the metadata records
    # the model's TRUE spec, not the (ignored) flag.
    ckpt_meta = {
        "model": args.model,
        "input_size": args.input_size,
        "nb_classes": args.nb_classes,
        "softmax_bits": 8 if args.model.startswith("swin")
        else args.softmax_bits,
        "gelu_stable": bool(args.gelu_stable),
    }
    if args.model.startswith("swin"):
        ckpt_meta["window_size"] = args.window_size

    steps_per_epoch = max(1, len(train_loader))
    sched = cosine_schedule(
        args.lr, steps_per_epoch, args.epochs,
        warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
        min_lr=args.min_lr,
    )
    betas = tuple(args.opt_betas) if args.opt_betas else (0.9, 0.999)
    if args.opt == "adamw":
        tx = optax.adamw(sched, b1=betas[0], b2=betas[1],
                         eps=args.opt_eps, weight_decay=args.weight_decay)
    elif args.opt == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(args.weight_decay),
            optax.sgd(sched, momentum=args.momentum),
        )
    else:
        raise ValueError(f"unknown optimizer {args.opt!r}")

    sample = jnp.zeros((2, args.input_size, args.input_size, 3), jnp.float32)
    ema_decay = args.model_ema_decay if args.model_ema else 0.0
    state = create_train_state(model, rng, sample, tx, ema_decay=ema_decay)

    if args.pretrained:
        from ivit_tpu.models.import_torch import load_pretrained

        state = state.replace(
            params=load_pretrained(args.pretrained, args.model, state.params)
        )
        logging.info("imported pretrained weights from %s", args.pretrained)

    start_epoch, best_acc1 = args.start_epoch, args.best_acc1
    ckpt_path = os.path.join(args.output_dir, "checkpoint.pkl")
    if args.resume:
        state, extra = load_checkpoint(args.resume, state)
        check_resume_spec(extra, ckpt_meta, args.model)
        start_epoch = extra.get("epoch", 0) + 1
        best_acc1 = extra.get("best_acc1", 0.0)
        logging.info("resumed from %s at epoch %d", args.resume, start_epoch)

    state = jax.device_put(
        state,
        zero1_shardings(state, mesh)
        if args.zero1
        else param_shardings(state, mesh),
    )
    dsh = data_sharding(mesh)
    n_proc = jax.process_count()

    def put_global(x, sh=dsh):
        """Host batch → global device array on the mesh.

        Single-process: a plain device_put. Multi-host: each process
        holds only its shard, and ``jax.device_put`` of host-local
        numpy would NOT assemble a global array —
        ``make_array_from_process_local_data`` does (the round-1
        review's §5.8 gap; proven by tests/test_multihost.py)."""
        x = np.asarray(x)
        if n_proc > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    train_step = jax.jit(
        make_train_step(model, ema_decay=ema_decay, grad_clip=args.clip_grad),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(make_eval_step(model))

    mix_cfg = MixupConfig(
        mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix,
        switch_prob=args.mixup_switch_prob,
        label_smoothing=args.smoothing,
        num_classes=args.nb_classes,
    )
    use_mixup = args.mixup > 0 or args.cutmix > 0
    mix_fn = jax.jit(lambda r, im, lb: mixup_cutmix(r, im, lb, mix_cfg))
    onehot_fn = jax.jit(
        lambda lb: jax.nn.one_hot(lb, args.nb_classes)
        * (1 - args.smoothing)
        + args.smoothing / args.nb_classes
    )

    dump_logits = bool(args.dump_logits) and args.eval
    if dump_logits:
        # rebuild the eval step to ALSO return the logits it already
        # computed — a separate logits-only forward doubled eval
        # wall-clock through the relay
        eval_step = jax.jit(make_eval_step(model, return_logits=True))

    def validate(epoch):
        variables = {"params": state.params, "quant_stats": state.quant_stats}
        acc1 = AverageMeter("acc1")
        acc5 = AverageMeter("acc5")
        dumped_logits, dumped_labels = [], []
        for images, labels in val_loader:
            n = images.shape[0]
            pad = -n % mesh.shape["data"]
            if pad:
                # modular indexing — pad can exceed n (small final
                # batch on a wide data mesh); the metric mask weights
                # the duplicates out via the valid-count argument
                idx = np.arange(pad) % n
                images = np.concatenate([images, images[idx]])
                labels = np.concatenate([labels, labels[idx]])
            out = eval_step(
                variables,
                put_global(images),
                put_global(labels),
                jnp.float32(n),
            )
            if dump_logits:
                m, batch_logits = out
                dumped_logits.append(np.asarray(batch_logits)[:n])
                dumped_labels.append(np.asarray(labels)[:n])
            else:
                m = out
            acc1.update(float(m["acc1"]), n)
            acc5.update(float(m["acc5"]), n)
        if dump_logits:
            np.savez(
                args.dump_logits,
                logits=np.concatenate(dumped_logits),
                labels=np.concatenate(dumped_labels),
            )
            logging.info("dumped %d val logits to %s",
                         sum(len(a) for a in dumped_labels), args.dump_logits)
        logging.info(
            "epoch %d  val acc@1 %.3f  acc@5 %.3f", epoch, acc1.avg, acc5.avg
        )
        return acc1.avg

    if args.calib_batches > 0:
        # PTQ-style range calibration: forward passes with EMA updates,
        # no optimizer step (the analogue of the reference's scales
        # settling during the first training batches).
        calib_fwd = jax.jit(
            lambda v, im: model.apply(
                v, im, train=True, mutable=["quant_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
        )
        variables = {"params": state.params, "quant_stats": state.quant_stats}
        train_loader.set_epoch(0)
        n_cal = 0
        for i, (images, labels) in enumerate(train_loader):
            if i >= args.calib_batches:
                break
            _, upd = calib_fwd(variables, put_global(images))
            variables = {"params": state.params, **upd}
            n_cal += 1
        if n_cal == 0:
            raise RuntimeError(
                "calibration saw ZERO batches — the train loader is empty "
                "(dataset smaller than one batch, or a loader failure)"
            )
        state = state.replace(quant_stats=variables["quant_stats"])
        logging.info("calibrated EMA ranges over %d batches", n_cal)

    if args.eval:
        acc1 = validate(start_epoch)
        return acc1

    # §5.3 failure recovery: graceful preemption. Preemptible TPU pools
    # deliver SIGTERM ahead of eviction; catch it, let the in-flight
    # step finish, write the rolling checkpoint mid-epoch, and exit
    # cleanly so --resume restarts the interrupted epoch (at-least-once
    # epoch semantics — no loader fast-forward state to get wrong). The
    # reference has no recovery story: its every-epoch save is commented
    # out (quant_train.py:256-261), so preemption loses the entire run
    # while accuracy hasn't improved.
    import signal

    preempt_sig: list = []

    def _on_preempt(signum, frame):
        preempt_sig.append(signum)

    try:
        prev_term = signal.signal(signal.SIGTERM, _on_preempt)
    except ValueError:  # not the main thread (in-process test callers)
        prev_term = None

    def _restore_handler():
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)

    def _preempt_save(epoch, step):
        save_checkpoint(
            ckpt_path, state,
            {"epoch": epoch - 1, "best_acc1": best_acc1,
             "preempted_step": step, **ckpt_meta},
        )
        logging.info(
            "preempted (signal %d) at epoch %d step %d — rolling "
            "checkpoint saved; rerun with --resume %s to restart the "
            "epoch", preempt_sig[0], epoch, step, ckpt_path,
        )
        _restore_handler()

    if args.pipe > 1:
        # -------- pipeline-parallel training loop (--pipe N) ---------
        # GPipe over a (data, pipe) mesh; the documented subset vs the
        # standard loop: frozen activation ranges, deterministic step
        # graph (no dropout/drop-path), optimizer state starts fresh.
        # Mixup targets, EMA, metrics, preemption, and checkpointing
        # are all live. Library: parallel/pipeline.py (forward is
        # bit-identical to sequential apply, tests/test_pipeline.py).
        from ivit_tpu.parallel import (
            from_pp_variables,
            make_pp_mesh,
            make_pp_train_step,
            pipeline_vit_forward,
            pp_shardings,
            pp_tree_shardings,
            stack_blocks,
            to_pp_variables,
            unstack_blocks,
        )

        n_dev = jax.device_count()
        if n_dev % args.pipe:
            raise SystemExit(
                f"--pipe {args.pipe} does not divide the "
                f"{n_dev}-device mesh"
            )
        data_pp = n_dev // args.pipe
        B = args.batch_size
        n_micro = args.pipe_microbatches
        if n_micro == 0:
            for cand in range(min(2 * args.pipe, B), 0, -1):
                if B % cand == 0 and (B // cand) % data_pp == 0:
                    n_micro = cand
                    break
        if (n_micro == 0 or B % n_micro
                or (B // n_micro) % data_pp):
            raise SystemExit(
                f"no valid microbatch count: batch {B} must split into "
                f"M microbatches of a multiple of data={data_pp} rows "
                f"(got --pipe-microbatches {args.pipe_microbatches})"
            )
        pp_mesh = make_pp_mesh(data=data_pp, pipe=args.pipe)
        logging.info(
            "pipeline parallelism: (data=%d, pipe=%d) mesh, "
            "%d microbatches/step", data_pp, args.pipe, n_micro,
        )

        pp_vars = to_pp_variables(
            {"params": state.params, "quant_stats": state.quant_stats},
            model.depth,
        )
        pp_vars = jax.device_put(pp_vars, pp_shardings(pp_vars, pp_mesh))
        pp_params = pp_vars["params"]
        pp_stats = pp_vars["quant_stats"]
        pp_ema = None
        if ema_decay:
            pp_ema = stack_blocks(state.ema_params, model.depth)
            pp_ema = jax.device_put(
                pp_ema, pp_tree_shardings(pp_ema, pp_mesh)
            )
        pp_opt = tx.init(pp_params)
        pp_step = jax.jit(
            make_pp_train_step(
                model, pp_mesh, n_micro, tx,
                grad_clip=args.clip_grad, ema_decay=ema_decay,
            ),
            donate_argnums=(0, 2, 3),
        )
        pp_fwd = jax.jit(
            lambda v, x: pipeline_vit_forward(model, v, x, pp_mesh, n_micro)
        )
        dsh_pp = data_sharding(pp_mesh)
        pad_mult = n_micro * data_pp

        def pp_validate(epoch):
            variables = {"params": pp_params, "quant_stats": pp_stats}
            acc1 = AverageMeter("acc1")
            acc5 = AverageMeter("acc5")
            for images, labels in val_loader:
                n = images.shape[0]
                pad = -n % pad_mult
                if pad:
                    idx = np.arange(pad) % n
                    images = np.concatenate([images, images[idx]])
                logits = np.asarray(
                    pp_fwd(variables, put_global(images, dsh_pp))
                )[:n]
                order = np.argsort(logits, -1)
                labels = np.asarray(labels)
                acc1.update(
                    100.0 * float(np.mean(order[:, -1] == labels)), n
                )
                acc5.update(
                    100.0 * float(
                        np.mean((order[:, -5:] == labels[:, None]).any(-1))
                    ),
                    n,
                )
            logging.info(
                "epoch %d  val acc@1 %.3f  acc@5 %.3f",
                epoch, acc1.avg, acc5.avg,
            )
            return acc1.avg

        def pp_state():
            un = from_pp_variables(
                {"params": pp_params, "quant_stats": pp_stats}, model.depth
            )
            return state.replace(
                params=un["params"],
                quant_stats=un["quant_stats"],
                ema_params=(
                    unstack_blocks(pp_ema, model.depth)
                    if pp_ema is not None else state.ema_params
                ),
            )

        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            logger = MetricLogger(
                len(train_loader), prefix=f"epoch {epoch} ",
                print_freq=args.print_freq,
            )
            t0 = time.time()
            n_steps = 0
            for i, (images, labels) in enumerate(train_loader):
                if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                    break
                if images.shape[0] != B:
                    continue  # GPipe needs the full static batch
                step_rng_pp = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed + 1), epoch * 100000 + i
                )
                images = put_global(images, dsh_pp)
                labels = put_global(labels, dsh_pp)
                if use_mixup:
                    images, targets = mix_fn(step_rng_pp, images, labels)
                else:
                    targets = onehot_fn(labels)
                pp_params, pp_opt, pp_ema, metrics = pp_step(
                    pp_params, pp_stats, pp_opt, pp_ema, images, targets
                )
                logger.update(
                    loss=float(metrics["loss"]),
                    acc1=float(metrics["acc1"]),
                )
                logger.log(i)
                n_steps += 1
                if preempt_sig:
                    save_checkpoint(
                        ckpt_path, pp_state(),
                        {"epoch": epoch - 1, "best_acc1": best_acc1,
                         "preempted_step": i, "pipe": args.pipe,
                         **ckpt_meta},
                    )
                    logging.info(
                        "preempted (signal %d) at epoch %d step %d — "
                        "rolling checkpoint saved; rerun with --resume "
                        "%s", preempt_sig[0], epoch, i, ckpt_path,
                    )
                    _restore_handler()
                    return best_acc1
            if not n_steps:
                raise RuntimeError(
                    f"epoch {epoch} ran ZERO steps — the train loader "
                    "yielded nothing (or no full batch for GPipe)"
                )
            logging.info(
                "epoch %d done in %.1fs (%d steps)",
                epoch, time.time() - t0, n_steps,
            )
            acc1 = pp_validate(epoch)
            if acc1 > best_acc1:
                best_acc1 = acc1
                save_checkpoint(
                    os.path.join(args.output_dir, "best.pkl"), pp_state(),
                    {"epoch": epoch, "best_acc1": best_acc1,
                     "pipe": args.pipe, **ckpt_meta},
                )
            save_checkpoint(
                ckpt_path, pp_state(),
                {"epoch": epoch, "best_acc1": best_acc1,
                 "pipe": args.pipe, **ckpt_meta},
            )
            logging.info("best acc@1: %.3f", best_acc1)

        _restore_handler()
        return best_acc1

    step_rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        logger = MetricLogger(
            len(train_loader), prefix=f"epoch {epoch} ", print_freq=args.print_freq
        )
        t0 = time.time()
        n_steps = 0
        for i, (images, labels) in enumerate(train_loader):
            if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                break
            if args.profile_steps and epoch == 0 and i == 10:
                jax.profiler.start_trace(
                    os.path.join(args.output_dir, "profile")
                )
            if args.profile_steps and epoch == 0 and i == 10 + args.profile_steps:
                jax.profiler.stop_trace()
            step_rng, k_mix, k_drop = jax.random.split(step_rng, 3)
            images = put_global(images)
            labels = put_global(labels)
            if use_mixup:
                images, targets = mix_fn(k_mix, images, labels)
            else:
                targets = onehot_fn(labels)
            state, metrics = train_step(state, images, targets, k_drop)
            logger.update(loss=float(metrics["loss"]), acc1=float(metrics["acc1"]))
            logger.log(i)
            n_steps += 1
            if preempt_sig:
                _preempt_save(epoch, i)
                return best_acc1
        if not n_steps:
            raise RuntimeError(
                f"epoch {epoch} ran ZERO steps — the train loader yielded "
                "nothing (empty dataset or a loader failure)"
            )
        logging.info(
            "epoch %d done in %.1fs (%d steps)",
            epoch, time.time() - t0, n_steps,
        )

        acc1 = validate(epoch)
        if acc1 > best_acc1:
            best_acc1 = acc1
            save_checkpoint(
                os.path.join(args.output_dir, "best.pkl"),
                state, {"epoch": epoch, "best_acc1": best_acc1, **ckpt_meta},
            )
        # rolling resume checkpoint EVERY epoch: the reference keeps
        # only the accuracy-best model (quant_train.py:256-261, its
        # every-epoch block is commented out), which makes mid-run
        # resume impossible while accuracy hasn't improved — a real
        # recovery gap for long runs (SURVEY §5.3/5.4)
        save_checkpoint(
            ckpt_path, state,
            {"epoch": epoch, "best_acc1": best_acc1, **ckpt_meta},
        )
        logging.info("best acc@1: %.3f", best_acc1)

    _restore_handler()
    return best_acc1


if __name__ == "__main__":
    main()
