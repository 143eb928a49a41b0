"""Config resolution tests: SimOTA auto-cap + `-D` override coercion.

Reference contract: `/root/reference/yolox/config.py` (`update()` type
coercion) and `yolox/exp/yolox_base.py:118` (max_labels=120).  The auto
cap sizes SimOTA compaction from the worst case of ~27 candidate anchors
per gt (see yolox_tpu/models/assign.py), so assignment cannot silently
deviate at the default settings.
"""

import pytest

from yolox_tpu import YoloxConfig

pytestmark = pytest.mark.smoke


def test_default_is_dense_exact():
    cfg = YoloxConfig.get_named_config("yolox_s")
    assert cfg.simota_candidates is None
    assert cfg.max_labels == 120
    # None = dense assignment over all anchors: exact by construction
    assert cfg.resolved_simota_candidates() is None


def test_explicit_cap_wins():
    cfg = YoloxConfig.get_named_config("yolox_s")
    cfg.update({"simota_candidates": "2048"})
    assert cfg.simota_candidates == 2048  # coerced to int, not "2048"
    assert cfg.resolved_simota_candidates() == 2048


def test_update_none_field_keeps_strings():
    cfg = YoloxConfig.get_named_config("yolox_s")
    cfg.update({"freeze_prefix": "backbone.backbone"})
    assert cfg.freeze_prefix == "backbone.backbone"


def test_update_max_labels():
    cfg = YoloxConfig.get_named_config("yolox_s")
    cfg.update({"max_labels": "76"})
    assert cfg.max_labels == 76
