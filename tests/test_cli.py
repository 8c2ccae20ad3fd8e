"""CLI surface parity: flags and defaults match the reference
(/root/reference/quant_train.py:23-138; README.md:28-35)."""

import quant_train


def parse(argv=()):
    return quant_train.build_parser().parse_args(list(argv))


class TestCLIDefaults:
    def test_reference_defaults(self):
        a = parse()
        assert a.model == "deit_tiny"
        assert a.data_set == "IMNET"
        assert a.nb_classes == 1000
        assert a.input_size == 224
        assert a.batch_size == 128
        assert a.epochs == 90
        assert a.opt == "adamw"
        assert a.lr == 1e-6
        assert a.sched == "cosine"
        assert a.weight_decay == 1e-4
        assert a.drop_path == 0.1
        assert a.smoothing == 0.1
        assert a.mixup == 0.8
        assert a.cutmix == 1.0
        assert a.reprob == 0.25
        assert a.aa == "rand-m9-mstd0.5-inc1"
        assert a.color_jitter == 0.4
        assert a.model_ema_decay == 0.99996
        assert a.seed == 0
        assert a.output_dir == "results/"
        # TPU-native parallelism extras default OFF
        assert a.mesh_model == 1
        assert a.pipe == 1 and a.pipe_microbatches == 0
        assert a.seq_parallel is False and a.zero1 is False

    def test_readme_recipe_invocation(self):
        # the README's documented invocation shape parses
        a = parse([
            "--model", "deit_small", "--data", "/data/imagenet",
            "--epochs", "30", "--lr", "5e-7",
        ])
        assert a.model == "deit_small" and a.epochs == 30 and a.lr == 5e-7

    def test_min_lr_forced_to_lr_over_15(self):
        # quant_train.py:202 analogue is applied in main();
        # replicate the assignment here
        a = parse(["--lr", "3e-6"])
        a.min_lr = a.lr / 15.0
        assert abs(a.min_lr - 2e-7) < 1e-12

    def test_all_models_in_registry(self):
        from ivit_tpu.models import MODEL_REGISTRY

        for name in ["deit_tiny", "deit_small", "deit_base",
                     "vit_base", "vit_large",
                     "swin_tiny", "swin_small", "swin_base"]:
            assert name in MODEL_REGISTRY


class TestResumeSpecGuard:
    """--resume must refuse a checkpoint whose recorded spec-level
    model properties (softmax_bits, gelu_stable, geometry) differ from
    the model this run builds — the same silent-mismatch hazard
    convert_model guards against (see quant_train.check_resume_spec)."""

    META = {
        "model": "deit_small",
        "input_size": 224,
        "nb_classes": 1000,
        "softmax_bits": 16,
        "gelu_stable": False,
    }

    def test_mismatch_raises(self):
        import pytest

        recorded = dict(self.META, softmax_bits=8, gelu_stable=True)
        with pytest.raises(SystemExit, match="softmax_bits"):
            quant_train.check_resume_spec(recorded, self.META, "deit_small")

    def test_match_passes(self):
        quant_train.check_resume_spec(dict(self.META), self.META,
                                      "deit_small")

    def test_pre_metadata_checkpoint_passes(self):
        # checkpoints written before the metadata record skip the check
        quant_train.check_resume_spec({"epoch": 3}, self.META, "deit_small")

    def test_legacy_swin_softmax16_record_tolerated(self):
        # swin checkpoints written before the fix recorded the (ignored)
        # ViT flag default 16, not the model's true 8-bit spec
        meta = dict(self.META, model="swin_tiny", softmax_bits=8,
                    window_size=7)
        recorded = dict(meta, softmax_bits=16)
        quant_train.check_resume_spec(recorded, meta, "swin_tiny")

    def test_geometry_mismatch_raises(self):
        import pytest

        recorded = dict(self.META, input_size=384)
        with pytest.raises(SystemExit, match="input_size"):
            quant_train.check_resume_spec(recorded, self.META, "deit_small")
