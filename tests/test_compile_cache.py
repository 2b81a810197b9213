"""Host-feature fingerprint for the persistent XLA:CPU AOT cache.

Pins the round-5 fixes: (a) ALL of model name / model / stepping / bugs
join the key (the original accumulation stopped at the first matching
line, so two hosts differing only in stepping shared — and cross-loaded —
ISA-tuned AOT entries, the `cpu_aot_loader` mismatch class); (b) the
`bugs` line + GDS-vulnerability state key the LLVM tuning attrs
(`+prefer-no-gather`) that are invisible in flags/model/stepping
(observed round 5); (c) an unreadable /proc/cpuinfo falls back to
platform identity instead of hashing a bare separator.
"""

import builtins

from video_similarity_search_tpu.utils import compile_cache


def _cpuinfo(stepping=2, model_name="Fake CPU @ 2.10GHz",
             bugs="spectre_v1 swapgs"):
    return (f"processor\t: 0\n"
            f"model name\t: {model_name}\n"
            f"model\t\t: 207\n"
            f"stepping\t: {stepping}\n"
            f"bugs\t\t: {bugs}\n"
            f"flags\t\t: fpu vme sse sse2 avx avx2\n")


def _fake_host(monkeypatch, cpuinfo_text, gds="Not affected"):
    real_open = builtins.open
    gds_path = ("/sys/devices/system/cpu/vulnerabilities/"
                "gather_data_sampling")

    def fake_open(path, *a, **kw):
        import io

        if path == "/proc/cpuinfo":
            if cpuinfo_text is None:
                raise OSError("no cpuinfo")
            return io.StringIO(cpuinfo_text)
        if path == gds_path:
            if gds is None:
                raise OSError("no sysfs")
            return io.StringIO(gds + "\n")
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", fake_open)


def test_stepping_joins_the_fingerprint(monkeypatch):
    _fake_host(monkeypatch, _cpuinfo(stepping=2))
    fp_a = compile_cache.host_feature_fingerprint()
    _fake_host(monkeypatch, _cpuinfo(stepping=5))
    fp_b = compile_cache.host_feature_fingerprint()
    assert fp_a != fp_b  # identical flags+model, different stepping


def test_model_name_joins_the_fingerprint(monkeypatch):
    _fake_host(monkeypatch, _cpuinfo())
    fp_a = compile_cache.host_feature_fingerprint()
    _fake_host(monkeypatch, _cpuinfo(model_name="Other CPU @ 2.10GHz"))
    fp_b = compile_cache.host_feature_fingerprint()
    assert fp_a != fp_b


def test_bugs_line_joins_the_fingerprint(monkeypatch):
    """The Downfall-mitigation tuning split: same flags/model/stepping,
    different kernel-reported bug set must not share AOT entries."""
    _fake_host(monkeypatch, _cpuinfo(bugs="spectre_v1 swapgs"))
    fp_a = compile_cache.host_feature_fingerprint()
    _fake_host(monkeypatch, _cpuinfo(bugs="spectre_v1 swapgs gds"))
    fp_b = compile_cache.host_feature_fingerprint()
    assert fp_a != fp_b


def test_gds_state_joins_the_fingerprint(monkeypatch):
    _fake_host(monkeypatch, _cpuinfo(), gds="Not affected")
    fp_a = compile_cache.host_feature_fingerprint()
    _fake_host(monkeypatch, _cpuinfo(),
               gds="Mitigation: Microcode")
    fp_b = compile_cache.host_feature_fingerprint()
    assert fp_a != fp_b
    # missing sysfs file: still works, and differs from both states
    _fake_host(monkeypatch, _cpuinfo(), gds=None)
    fp_c = compile_cache.host_feature_fingerprint()
    assert fp_c not in (fp_a, fp_b)


def test_unreadable_cpuinfo_uses_platform_fallback(monkeypatch):
    import platform

    _fake_host(monkeypatch, None, gds=None)
    monkeypatch.setattr(platform, "machine", lambda: "archA")
    fp_a = compile_cache.host_feature_fingerprint()
    monkeypatch.setattr(platform, "machine", lambda: "archB")
    fp_b = compile_cache.host_feature_fingerprint()
    # the fallback (not a constant '|') keys the cache: different machine
    # identities must not share AOT entries
    assert fp_a != fp_b


def test_fingerprint_shape_and_stability():
    fp = compile_cache.host_feature_fingerprint()
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)
    assert fp == compile_cache.host_feature_fingerprint()
    assert fp in compile_cache.cpu_cache_dir()


def test_parser_captures_every_identity_line(monkeypatch):
    """'model' must not swallow 'model name'/'stepping'/'bugs'
    accumulation (the round-5 `not model` bug): removing ANY identity
    line changes the hash."""
    _fake_host(monkeypatch, _cpuinfo())
    base = compile_cache.host_feature_fingerprint()
    for drop in ("model name", "model\t", "stepping", "bugs"):
        text = "\n".join(l for l in _cpuinfo().splitlines()
                         if not l.startswith(drop)) + "\n"
        _fake_host(monkeypatch, text)
        assert compile_cache.host_feature_fingerprint() != base, drop
