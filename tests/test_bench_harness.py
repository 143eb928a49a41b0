"""Static guards for the benchmark harness (bench.py).

The driver runs `python bench.py` at the end of every round and records
the JSON line; a name-registry drift or a README_ROWS typo would silently
break that lane on real hardware, where no test runs first. These checks
execute no device code — they validate the harness's static tables and
the config-registry lookups it performs at startup.
"""

import importlib.util
import pathlib

import pytest

REPO = pathlib.Path(__file__).parent.parent


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_row_model_resolves_in_the_config_registry(bench):
    from yolox_tpu import YoloxConfig

    for model, mode, _remat, _int8 in bench.README_ROWS:
        registry_name = model if model == "yolov3" else f"yolox_{model}"
        cfg = YoloxConfig.get_named_config(registry_name)  # raises if bad
        assert cfg.num_classes == 80
        assert mode in bench.DEFAULT_ITERS


def test_every_row_has_its_batch_table_entry(bench):
    for model, mode, _remat, _int8 in bench.README_ROWS:
        table = (bench.TRAIN_BATCH if mode.startswith("train")
                 else bench.SERVE_BATCH)
        assert model in table, f"{model} missing from batch table"
        assert table[model] >= 1


def test_headline_row_present_and_first_s_serve(bench):
    # the driver's headline metric comes from `python bench.py` (defaults
    # model=s mode=serve); run_one renames it to the stable string below
    import inspect

    # the string literal is line-wrapped in source; normalize adjacent
    # string concatenation before checking
    src = inspect.getsource(bench.run_one).replace('"\n', '"').replace(
        '"  ', '"').replace('" "', "")
    compact = "".join(part.strip() for part in src.splitlines())
    assert ("yolox_s 640px batched inference incl. NMS" in compact
            and '"(bf16)"' in compact)


def test_v100_anchor_table_matches_survey(bench):
    # SURVEY §6 published V100 batch-1 fp16 ms (docs/model_zoo.md:7-11)
    assert bench.V100_MS == {"s": 9.8, "m": 12.3, "l": 14.5, "x": 17.3,
                             "yolov3": 11.1}


def test_default_iters_cover_all_modes(bench):
    assert set(bench.DEFAULT_ITERS) == {"serve", "serve-b1", "fwd",
                                        "train", "train-aug"}
    assert all(v >= 8 for v in bench.DEFAULT_ITERS.values())
