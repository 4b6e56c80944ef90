"""Resume semantics of the on-TPU correctness campaign.

Mirrors the reference gate's always-on-device role
(zero_one_correctness_check.py:192-271): a transient infra failure must
not permanently mask a config from verification, while a numerical
verdict must never be rerolled.
"""

import json

from scripts.correctness_campaign_tpu import load_done


def _line(mnk, acc, ok, error=""):
    r = {"mnk": mnk, "acc": acc, "pass": ok}
    if error:
        r["error"] = error
    return json.dumps(r)


def test_pass_and_numerical_failure_are_done():
    text = "\n".join([
        _line("64x64x64", "float32", True),
        _line("128x128x128", "bfloat16", False,
              "AssertionError: diff 1.0 != 0.0"),
    ])
    done = load_done(text)
    assert ("64x64x64", "float32") in done
    assert ("128x128x128", "bfloat16") in done


def test_transient_infra_failure_is_retried():
    text = _line("512x8192x256", "bfloat16", False,
                 "JaxRuntimeError: INTERNAL: http://127.0.0.1:8103/"
                 "remote_compile: HTTP 500: tpu_compile_helper exit 1")
    assert load_done(text) == set()


def test_retry_verdict_supersedes_transient_failure():
    key = ("512x8192x256", "float32")
    fail = _line(*key, False, "HTTP 500: tpu_compile_helper exit 1")
    # pass after retry -> done; numerical failure after retry -> done
    assert key in load_done(fail + "\n" + _line(*key, True))
    assert key in load_done(
        fail + "\n" + _line(*key, False, "AssertionError: diff 2.0"))
    # transient failure after an earlier pass re-opens it (latest wins)
    assert key not in load_done(_line(*key, True) + "\n" + fail)


def test_garbage_lines_ignored():
    assert load_done("not json\n{broken") == set()


def test_config_aware_resume_invalidates_retuned_winner():
    """A verdict belongs to the config it ran against: retuning a shape
    re-opens it even though its key passed (round-5 campaign semantics)."""
    from scripts.correctness_campaign_tpu import (load_latest_configs,
                                                  verdict_covers)
    key = ("64x64x64", "float32")
    cfg_old = {"bm": 64, "bn": 64, "bk": 64, "use_xla": False}
    cfg_new = {"bm": 128, "bn": 64, "bk": 64, "use_xla": False}
    text = json.dumps({"mnk": key[0], "acc": key[1], "pass": True,
                       "config": cfg_old})
    done, latest = load_done(text), load_latest_configs(text)
    assert verdict_covers(done, latest, key, cfg_old)
    assert not verdict_covers(done, latest, key, cfg_new)
    # legacy records (no config field) count by key alone
    legacy = _line(*key, True)
    assert verdict_covers(load_done(legacy), load_latest_configs(legacy),
                          key, cfg_new)
    # a key never recorded is not covered regardless of config
    assert not verdict_covers(set(), {}, key, cfg_old)
