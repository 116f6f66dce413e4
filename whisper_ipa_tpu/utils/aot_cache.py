"""Persistent compiled-executable cache (serve-start compile skipping).

The XLA persistent compilation cache does not hit under the axon
remote-compile path (docs/PERF.md), so every serve start pays minutes of
remote compiles per program. ``jax.experimental.serialize_executable``
round-trips compiled TPU executables (measured: deserialize ~0 s, run
correct), so this module caches the COMPILED BINARY keyed by a hash of
the lowered StableHLO text — an exact key: identical program text means
an identical executable.

Usage (opt-in, zero behavior change when disabled):

    os.environ["WHISPER_IPA_TPU_AOT_CACHE"] = "~/.cache/whisper_aot"
    out = aot_call(_greedy_decode_jit, params, cfg, feats, ...)

``aot_call(jitted, *args, **kwargs)`` is a drop-in for
``jitted(*args, **kwargs)``:

- disabled (env var unset and no ``set_cache_dir``): calls through.
- enabled: first call per (fn, static values, dynamic avals) binds the
  signature, lowers (tracing only — no backend compile), hashes the
  StableHLO, and either deserializes the cached executable or compiles
  and persists it. Subsequent calls hit an in-memory fast key, so hot
  loops pay one dict lookup, not a retrace.
- WHISPER_IPA_TPU_AOT_FAST_DISK=1 (or ``set_fast_disk(True)``): also
  store executables under a PRE-TRACE key (source hash + fn identity +
  statics + avals + policy/env fingerprint), so a warm process skips
  tracing and lowering entirely — the 70-100 s the exact key still
  costs on this host (docs/PERF.md serve-start table). The pre-trace
  path only ever engages for jitted programs explicitly vetted with
  ``fast_disk_vetted(jitted)`` — a per-function allowlist asserting the
  trust contract in ``_fast_disk_key`` (the program closes over no
  arrays or unfingerprinted globals). Unvetted functions silently use
  the exact StableHLO-keyed path even with the env var set, so turning
  the knob on globally (serve CLI, bench.py) cannot serve a stale
  executable for a future call site that breaks the contract.

The reference has no equivalent (MLX compiles lazily in-process; startup
cost is not its bottleneck) — this is TPU-serving infrastructure
(docs/ROADMAP.md "axon remote-compile latency").
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
from typing import Any, Dict, Tuple

import jax

_lock = threading.Lock()
_fast: Dict[Tuple, Any] = {}  # fast key -> compiled executable
_stats = {"fast_hits": 0, "disk_hits": 0, "compiles": 0,
          "fast_disk_hits": 0}
_cache_dir_override: str | None = None
_fast_disk_override: bool | None = None
_src_fingerprint: str | None = None


def set_cache_dir(path: str | None) -> None:
    """Programmatic override of WHISPER_IPA_TPU_AOT_CACHE ('' disables)."""
    global _cache_dir_override
    _cache_dir_override = path


def set_fast_disk(enabled: bool | None) -> None:
    """Programmatic override of WHISPER_IPA_TPU_AOT_FAST_DISK.

    None = env var decides (default off). See ``_fast_disk_key`` for the
    trust contract of this mode.
    """
    global _fast_disk_override
    _fast_disk_override = enabled


def fast_disk_enabled() -> bool:
    if _fast_disk_override is not None:
        return _fast_disk_override
    return os.environ.get("WHISPER_IPA_TPU_AOT_FAST_DISK") == "1"


def fast_disk_vetted(jitted):
    """Mark a jitted program as satisfying the fast-disk trust contract.

    Apply at the jit-creation site — where closure capture is visible —
    after checking the traced program is a pure function of
    (package source, static args, dynamic avals, policy/env state): no
    closed-over arrays, no module-level knobs missing from
    ``_program_fingerprint``. Only vetted programs use the pre-trace
    disk key; everything else falls back to the exact StableHLO key.
    Returns ``jitted`` so it composes as a wrapper.
    """
    jitted._whisper_fast_disk_ok = True
    return jitted


def _is_fast_disk_vetted(jitted) -> bool:
    return bool(getattr(jitted, "_whisper_fast_disk_ok", False))


def cache_dir() -> str | None:
    d = (
        _cache_dir_override
        if _cache_dir_override is not None
        else os.environ.get("WHISPER_IPA_TPU_AOT_CACHE")
    )
    return os.path.expanduser(d) if d else None


def stats() -> Dict[str, int]:
    return dict(_stats)


def _split_args(jitted, args, kwargs):
    """Canonicalize a jitted call into (pos_dyn, kw_dyn, kw_static).

    Binds the caller's mixed positional/keyword arguments to the wrapped
    function's signature (defaults NOT applied — explicitly passing a
    default would change how jit traces it), then re-emits them in a
    canonical form: dynamic args stay positional up to the first static
    or omitted parameter, and everything after goes by keyword. Lowering
    with exactly this form lets the compiled executable be re-invoked
    with ``compiled(*pos_dyn, **kw_dyn)`` (statics are baked in).
    """
    info = jitted._jit_info
    sig = info.fun_signature
    bound = sig.bind(*args, **kwargs)
    static_idx = set(info.static_argnums)
    static_names = set(info.static_argnames)

    pos_dyn = []
    kw_dyn = {}
    kw_static = {}
    positional_run = True
    for i, (name, param) in enumerate(sig.parameters.items()):
        present = name in bound.arguments
        is_static = i in static_idx or name in static_names
        if not present:
            positional_run = False
            continue
        v = bound.arguments[name]
        if is_static:
            kw_static[name] = v
            positional_run = False
        elif positional_run and param.kind in (
            param.POSITIONAL_ONLY,
            param.POSITIONAL_OR_KEYWORD,
        ):
            pos_dyn.append(v)
        else:
            kw_dyn[name] = v
    statics_key = tuple(sorted(kw_static.items()))
    return pos_dyn, kw_dyn, kw_static, statics_key


def _aval_sig(tree) -> Tuple:
    leaves, treedef = jax.tree.flatten(tree)
    return (
        str(treedef),
        tuple(
            (
                getattr(x, "shape", None),
                str(getattr(x, "dtype", type(x))),
                # shardings are part of the compiled signature: the same
                # shape/dtype arrives replicated in one call and
                # mesh-sharded in the next (DP eval, sharded engine) and
                # an executable built for one layout rejects the other
                str(getattr(x, "sharding", None)),
            )
            for x in leaves
        ),
    )


def _source_fingerprint() -> str:
    """Content hash of every .py file in the installed package.

    Any code change anywhere in whisper_ipa_tpu invalidates fast-disk
    keys (the traced program is a function of the source). Cached per
    process; the walk reads ~1.5 MB once (~ms).
    """
    global _src_fingerprint
    if _src_fingerprint is None:
        import whisper_ipa_tpu

        root = os.path.dirname(os.path.abspath(whisper_ipa_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                p = os.path.join(dirpath, fn)
                h.update(p[len(root):].encode())
                with open(p, "rb") as f:
                    h.update(f.read())
        _src_fingerprint = h.hexdigest()
    return _src_fingerprint


# Env vars that never shape a traced program: the cache's own knobs,
# bench/driver process control, and host-side data-file paths (weights
# and data arrive as jit ARGUMENTS, so the aval signature already keys
# them; panphon/kanji/native-lib feed host-only code). Keeping these out
# of the fingerprint lets pre-trace keys warmed by the measurement queue
# (which sets NO_QUEUE_WAIT=1) hit in a serve process that doesn't.
_NON_PROGRAM_ENV = frozenset((
    "WHISPER_IPA_TPU_AOT_CACHE",
    "WHISPER_IPA_TPU_AOT_FAST_DISK",
    "WHISPER_IPA_TPU_NO_QUEUE_WAIT",
    "WHISPER_IPA_TPU_BENCH_NO_CPU_FALLBACK",
    "WHISPER_IPA_TPU_SKIP_PROBE",
    "WHISPER_IPA_TPU_BENCH_CKPT",
    "WHISPER_IPA_TPU_BENCH_DATA",
    "WHISPER_IPA_TPU_WEIGHTS_DIR",
    "WHISPER_IPA_TPU_PANPHON_CSV",
    "WHISPER_IPA_TPU_KANJI_DICT",
    "WHISPER_IPA_TPU_NATIVE_LIB",
    "WHISPER_IPA_TPU_DRYRUN_REAL",
))


def _program_fingerprint() -> str:
    """Everything OUTSIDE the call signature that shapes the traced
    program: kernel-policy env vars and their programmatic overrides,
    XLA flags, and the jax config knobs the framework touches."""
    items = sorted(
        (k, v)
        for k, v in os.environ.items()
        if (
            k.startswith("WHISPER_IPA_TPU_") or k.startswith("JAX_")
            or k == "XLA_FLAGS"
        )
        and k not in _NON_PROGRAM_ENV
    )
    try:  # setters bypass the env vars, so read the live policy state
        from ..models import layers as _l
        from ..models import whisper as _w

        items.append(("_policy", repr((
            _l._INT8_ACTIVATIONS, _l._INT4_MATMUL, _l._FUSED_ATTENTION,
            _l._MERGED_ATTENTION, _l._DECODE_KERNEL, _w._FUSED_KV_INIT,
        ))))
    except Exception:
        items.append(("_policy", "unavailable"))
    try:
        items.append(("_jaxcfg", repr((
            jax.config.jax_enable_x64,
            jax.config.jax_default_matmul_precision,
        ))))
    except Exception:
        items.append(("_jaxcfg", "unavailable"))
    return repr(items)


def _fast_disk_key(jitted, statics_key, avals) -> str:
    """Pre-trace disk key (WHISPER_IPA_TPU_AOT_FAST_DISK=1, opt-in).

    The exact key (sha256 of lowered StableHLO) is unforgeable but costs
    a full trace+lower per program — measured 70-100 s of every warm
    serve start on the 1-core axon host (docs/PERF.md serve-start
    table). This key is computed WITHOUT tracing from everything that
    determines the traced program at the framework's own call sites:
    package source hash, function identity, static argument reprs,
    dynamic aval/sharding signature, kernel-policy state, XLA/JAX env,
    jax version and device kind.

    TRUST CONTRACT: valid iff the jitted function's program is a pure
    function of (source code, statics, avals, policy/env state) — i.e.
    it closes over no arrays or mutable globals outside the fingerprint.
    Every aot_call site in this package satisfies that (weights are
    arguments everywhere). A wrong-but-signature-compatible hit cannot
    be detected without lowering, which is exactly the cost this mode
    removes — hence the double gate: the env knob/setter AND a
    per-function ``fast_disk_vetted`` allowlist entry, asserted at the
    jit-creation site where closure capture is visible.
    """
    dev = jax.devices()[0]
    fn = jitted.__wrapped__ if hasattr(jitted, "__wrapped__") else jitted
    ident = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', repr(fn))}"
    # jaxlib/libtpu can change compiled code while jax.__version__ stays
    # put, and this key never sees the StableHLO — fingerprint the whole
    # runtime stack, not just the jax front-end
    try:
        jaxlib_ver = jax.lib.__version__
    except Exception:
        jaxlib_ver = "?"
    runtime_env = sorted(
        (k, v) for k, v in os.environ.items()
        if k.startswith("TPU_") or k == "LIBTPU_INIT_ARGS"
    )
    blob = repr((
        jax.__version__, jaxlib_ver, runtime_env, dev.device_kind,
        _source_fingerprint(), ident,
        repr(statics_key), repr(avals), _program_fingerprint(),
    ))
    return hashlib.sha256(blob.encode()).hexdigest()[:40]


def _load_payload(path):
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        payload, in_tree, out_tree, dev_ids = pickle.load(f)
    by_id = {dv.id: dv for dv in jax.devices()}
    exec_devs = [by_id[i] for i in dev_ids]
    return se.deserialize_and_load(
        payload, in_tree, out_tree, execution_devices=exec_devs
    )


def aot_call(jitted, *args, **kwargs):
    """Drop-in for ``jitted(*args, **kwargs)`` with executable caching."""
    d = cache_dir()
    if not d:
        return jitted(*args, **kwargs)

    pos_dyn, kw_dyn, kw_static, statics_key = _split_args(
        jitted, args, kwargs
    )
    fast_key = (
        id(jitted), statics_key, _aval_sig((pos_dyn, kw_dyn))
    )
    with _lock:
        compiled = _fast.get(fast_key)
    if compiled is not None:
        _stats["fast_hits"] += 1
        return compiled(*pos_dyn, **kw_dyn)

    # fast-disk path (opt-in + per-function vetting): skip trace+lower
    # entirely when a stored executable matches the pre-trace key. Load
    # failures fall through to the exact StableHLO-keyed path; CALL
    # failures of a donated-argument program must NOT fall through — the
    # failed call may already have donated/deleted its input buffers and
    # a silent retry would crash later with a confusing buffer-deleted
    # error (ADVICE r4).
    fpath = None
    if fast_disk_enabled() and _is_fast_disk_vetted(jitted):
        fkey = _fast_disk_key(
            jitted, statics_key, _aval_sig((pos_dyn, kw_dyn))
        )
        fpath = os.path.join(d, f"fk_{fkey}.jaxexec")
        if os.path.isfile(fpath):
            compiled = None
            try:
                compiled = _load_payload(fpath)
            except Exception as e:
                import sys

                print(
                    f"aot_cache: fast-disk executable {fpath} failed to "
                    f"load ({type(e).__name__}: {e}); falling back to "
                    "the exact path",
                    file=sys.stderr,
                )
            if compiled is not None:
                try:
                    out = compiled(*pos_dyn, **kw_dyn)
                except Exception as e:
                    info = getattr(jitted, "_jit_info", None)
                    donates = bool(
                        getattr(info, "donate_argnums", ())
                        or getattr(info, "donate_argnames", ())
                    )
                    if donates:
                        raise  # inputs may be gone; a retry is unsafe
                    import sys

                    print(
                        f"aot_cache: fast-disk executable call failed "
                        f"({type(e).__name__}: {e}); falling back to "
                        "the exact path",
                        file=sys.stderr,
                    )
                else:
                    _stats["fast_disk_hits"] += 1
                    with _lock:
                        _fast[fast_key] = compiled
                    return out

    # lower in the canonical form; the executable is later re-invoked
    # with the same (positional dynamics, keyword dynamics) split
    lowered = jitted.lower(*pos_dyn, **kw_dyn, **kw_static)
    hlo = lowered.as_text()
    dev = jax.devices()[0]
    key = hashlib.sha256(
        (jax.__version__ + dev.device_kind + hlo).encode()
    ).hexdigest()[:40]
    path = os.path.join(d, f"{key}.jaxexec")

    compiled = None
    from_disk = False
    if os.path.isfile(path):
        try:
            # restore onto the SAME devices the executable was built for
            # (deserialize defaults to ALL local devices, which breaks
            # single-device programs on multi-device hosts)
            compiled = _load_payload(path)
            _stats["disk_hits"] += 1
            from_disk = True
        except Exception as e:
            import sys

            print(
                f"aot_cache: stored executable {path} failed to load "
                f"({type(e).__name__}: {e}); recompiling",
                file=sys.stderr,
            )
            compiled = None  # stale/incompatible: fall through to compile

    def _compile_and_persist():
        compiled = lowered.compile()
        _stats["compiles"] += 1
        try:
            from jax.experimental import serialize_executable as se

            payload, in_tree, out_tree = se.serialize(compiled)
            dev_ids = [
                dv.id
                for dv in compiled._executable.xla_executable.local_devices()
            ]
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, dev_ids), f)
            os.replace(tmp, path)  # atomic: concurrent servers race safely
        except Exception as e:
            import sys

            # not serializable on this backend: still usable in-process,
            # but say so once — otherwise every serve start silently
            # recompiles and the cache looks broken for no visible reason
            print(
                f"aot_cache: could not persist executable "
                f"({type(e).__name__}: {e}); in-process cache only",
                file=sys.stderr,
            )
        return compiled

    if compiled is None:
        compiled = _compile_and_persist()

    try:
        out = compiled(*pos_dyn, **kw_dyn)
    except Exception as e:
        if not from_disk:
            raise
        info = getattr(jitted, "_jit_info", None)
        if getattr(info, "donate_argnums", ()) or getattr(
            info, "donate_argnames", ()
        ):
            raise  # donated inputs may be gone; a retry is unsafe
        # loaded executable rejected the call (device/layout mismatch
        # across environments): recompile rather than fail the request.
        # A GENUINE runtime failure (e.g. OOM) will re-raise from the
        # recompiled run below — the log line keeps the cached binary
        # from silently eating the first error.
        import sys

        print(
            f"aot_cache: cached executable call failed "
            f"({type(e).__name__}: {e}); recompiling and retrying",
            file=sys.stderr,
        )
        _stats["disk_hits"] -= 1
        compiled = _compile_and_persist()
        out = compiled(*pos_dyn, **kw_dyn)

    # mirror the (now call-validated) executable under the pre-trace key
    # so the NEXT process skips trace+lower for this program
    if fpath is not None and os.path.isfile(path) and not os.path.exists(
        fpath
    ):
        try:
            os.link(path, fpath)
        except OSError:
            import shutil

            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            os.close(fd)
            shutil.copyfile(path, tmp)
            os.replace(tmp, fpath)

    with _lock:
        _fast[fast_key] = compiled
    return out
