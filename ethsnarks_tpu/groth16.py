"""Groth16-"zok" proof system: generator, prover context, prover.

Structure parity with src/r1cs_gg_ppzksnark_zok/ (SURVEY.md §2.1): the
"nozk" variant - no r/s blinding, deterministic proofs (tcc:533-540), sparse
A/B queries (zero entries dropped, hpp:209-233), vk with alpha in G1 and
beta/gamma/delta in G2 so the unmodified Verifier.sol / verifier.py accept
the proofs.

TPU mapping: the witness map runs on device (:mod:`ethsnarks_tpu.qap`);
multi-scalar multiplications run on device via :mod:`ethsnarks_tpu.ops.msm`
when available, with an exact host fallback.  The H-query is stored in
bit-reversed order to match the NTT output layout (no permutation at prove
time).

``ProverContext`` plays the role of the reference's ProverContextT
(hpp:279-291): per-circuit compiled artifacts (QAP arrays, jitted programs,
device-resident key shards) reused across proofs.
"""

import os
import secrets
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def _digit_extract_jit(c):
    """Jitted on-device digit extraction for a query's witness columns."""
    import jax
    import jax.numpy as jnp
    from .ops import msm as msm_ops

    @jax.jit
    def run(wl, idx):
        return msm_ops.window_digits_device(jnp.take(wl, idx, axis=1), c)

    return run


@lru_cache(maxsize=None)
def _digit_extract_pad_jit(c, pad_to):
    """Digit extraction + zero-pad of the batch axis to pad_to columns
    (the mesh prover's common G1 pad; zero digits hit identity points)."""
    import jax
    import jax.numpy as jnp
    from .ops import msm as msm_ops

    @jax.jit
    def run(wl, idx):
        d = msm_ops.window_digits_device(jnp.take(wl, idx, axis=1), c)
        return jnp.pad(d, ((0, 0), (0, pad_to - idx.shape[0])))

    return run


from .field import SNARK_SCALAR_FIELD
from .qap import QAP
from . import bn254
from .bn254 import (
    G1_GEN, G2_GEN, multiply, add, neg)
from .verifier import VerifyingKey, Proof

P = SNARK_SCALAR_FIELD


class Config(object):
    """Prover runtime tuning (parity: libsnark::Config, prover_config.hpp).

    Knobs that exist on TPU map directly; CPU-cache knobs are accepted for
    API compatibility and ignored (documented):

    - multi_exp_c: Pippenger window bits override (None = size heuristic)
    - msm_max_lanes: dense-pipeline lane budget per window group (sets the
      lax.scan group width in ops/msm_red._plan; default 2^23 G1 / 2^22 G2)
    - msm_static_plan: 'auto' (static for the device-resident H query,
      host-exact for A/B/L), True (static everywhere - no host digit
      inspection, overflow-replan backstop), False (host-exact everywhere)
    - fft: 'dif_dit' (the only engine; 'basic_radix2'/'recursive' accepted
      as aliases for compatibility)
    - swapAB: evaluate B-query via swapped operand order (accepted, no-op -
      the TPU matvec is order-insensitive)
    - num_threads/smt/prefetch_*/multi_exp_look_ahead: CPU-only knobs,
      ignored.
    """

    def __init__(self, multi_exp_c=None, fft='dif_dit', swapAB=False,
                 num_threads=0, smt=False, radixes=(),
                 multi_exp_prefetch_locality=3, prefetch_stride=0,
                 multi_exp_look_ahead=1, msm_max_lanes=None,
                 msm_static_plan='auto'):
        self.multi_exp_c = multi_exp_c
        self.fft = fft
        self.swapAB = swapAB
        self.num_threads = num_threads
        self.smt = smt
        self.radixes = tuple(radixes)
        self.multi_exp_prefetch_locality = multi_exp_prefetch_locality
        self.prefetch_stride = prefetch_stride
        self.multi_exp_look_ahead = multi_exp_look_ahead
        self.msm_max_lanes = msm_max_lanes
        assert msm_static_plan in ('auto', True, False)
        self.msm_static_plan = msm_static_plan


class _FixedBaseMul(object):
    """Window-table fixed-base multiplier (host batch_exp equivalent)."""

    def __init__(self, base, bits=256, window=8):
        self.window = window
        self.tables = []
        cur = base
        for _ in range((bits + window - 1) // window):
            row = [None]
            acc = None
            for _ in range((1 << window) - 1):
                acc = add(acc, cur)
                row.append(acc)
            self.tables.append(row)
            cur = add(row[-1], cur)  # cur * 2^window

    def mul(self, scalar):
        scalar = int(scalar) % P
        out = None
        i = 0
        while scalar:
            digit = scalar & ((1 << self.window) - 1)
            if digit:
                out = add(out, self.tables[i][digit])
            scalar >>= self.window
            i += 1
        return out

    def mul_many(self, scalars):
        return [self.mul(s) for s in scalars]


class ProvingKey(object):
    """nozk proving key: sparse A (G1) / B (G2) queries, dense bitrev H query
    (G1), L query (G1, aux variables only).

    The optional zk extras (delta_g1, beta_g1, b_query_g1 - the parts the
    reference's zk-form key keeps and the nozk conversion drops,
    r1cs_gg_ppzksnark_zok.hpp:172-274) enable r/s-blinded proving; keys
    generated with ``generator(zk=False)`` omit them and prove
    deterministically."""

    def __init__(self, alpha_g1, beta_g2, delta_g2, a_query, b_query,
                 h_query_bitrev, l_query, num_inputs, delta_g1=None,
                 beta_g1=None, b_query_g1=None):
        self.alpha_g1 = alpha_g1
        self.beta_g2 = beta_g2
        self.delta_g2 = delta_g2
        self.a_query = a_query            # list[(idx, G1)]
        self.b_query = b_query            # list[(idx, G2)]
        self.h_query_bitrev = h_query_bitrev  # list[G1 or None], len m
        self.l_query = l_query            # list[G1 or None], aux vars
        self.num_inputs = num_inputs
        self.delta_g1 = delta_g1          # zk extras (None on nozk keys)
        self.beta_g1 = beta_g1
        self.b_query_g1 = b_query_g1      # list[(idx, G1)]

    @property
    def has_zk_extras(self):
        return (getattr(self, 'delta_g1', None) is not None
                and getattr(self, 'beta_g1', None) is not None
                and getattr(self, 'b_query_g1', None) is not None)


class Keypair(object):
    def __init__(self, pk, vk):
        self.pk = pk
        self.vk = vk


def generator(cs, rng=None, device_exp='auto', zk=False):
    """Trusted setup over a finished (constrained) ConstraintSystem.

    rng: optional callable returning random field elements (for tests);
    defaults to rejection-sampled secrets.randbelow.

    device_exp: run the batch exponentiations (the setup hot path,
    reference tcc:358-412) on the accelerator via ops.batch_exp.  'auto'
    enables it on TPU; the host window-table path is used elsewhere.

    zk: also keep the zk-form extras (delta_g1, beta_g1, G1 B-query) so
    the prover can add r/s blinding (prove(..., blind=True)).  The fork's
    default is the nozk key: deterministic proofs, smaller key."""
    import time as _time
    profile = os.environ.get("ETHSNARKS_SETUP_PROFILE") == "1"
    marks = [('start', _time.perf_counter())]

    def mark(name):
        if profile:
            marks.append((name, _time.perf_counter()))

    rng = rng or (lambda: secrets.randbelow(P - 1) + 1)
    qap = QAP(cs)
    mark('qap_build')
    if device_exp == 'auto':
        import jax
        try:
            device_exp = jax.default_backend() == 'tpu'
        except Exception:
            device_exp = False

    while True:
        t = rng()
        if pow(t, qap.domain_size, P) != 1:
            break
    alpha, beta, gamma, delta = rng(), rng(), rng(), rng()
    gamma_inv = pow(gamma, -1, P)
    delta_inv = pow(delta, -1, P)

    At, Bt, Ct, Zt = qap.instance_map(t)
    mark('instance_map')
    nv = qap.num_variables
    ni = qap.num_inputs
    m = qap.domain_size

    if device_exp:
        from .ops.batch_exp import _BatchExp
        g1 = _BatchExp(G1_GEN, 'g1')
        g2 = _BatchExp(G2_GEN, 'g2')
    else:
        g1 = _FixedBaseMul(G1_GEN)
        g2 = _FixedBaseMul(G2_GEN)

    # Sparse queries (drop zero entries - the nozk key conversion).
    a_idx = [i for i in range(nv) if At[i]]
    a_query = list(zip(a_idx, g1.mul_many([At[i] for i in a_idx])))
    mark('a_query')
    b_idx = [i for i in range(nv) if Bt[i]]
    b_query = list(zip(b_idx, g2.mul_many([Bt[i] for i in b_idx])))
    mark('b_query_g2')

    # H query: (t^i * Z(t) / delta) G1, stored bit-reversed.
    zt_delta = Zt * delta_inv % P
    h_scalar = [0] * m
    acc = zt_delta
    for i in range(m):
        h_scalar[i] = acc
        acc = acc * t % P
    bitrev = qap.domain.bitrev
    h_query_bitrev = g1.mul_many(
        [h_scalar[int(bitrev[p])] for p in range(m)])
    mark('h_query')

    # L query (aux variables): (beta*A_i + alpha*B_i + C_i)/delta * G1.
    l_query = g1.mul_many(
        [(beta * At[i] + alpha * Bt[i] + Ct[i]) % P * delta_inv % P
         for i in range(ni + 1, nv)])
    mark('l_query')

    # vk
    gamma_abc = g1.mul_many(
        [(beta * At[i] + alpha * Bt[i] + Ct[i]) % P * gamma_inv % P
         for i in range(0, ni + 1)])
    mark('gamma_abc')
    assert all(p is not None for p in gamma_abc), \
        "zero gammaABC entry; input variable unused"

    vk = VerifyingKey(
        alpha=g1.mul(alpha),
        beta=g2.mul(beta),
        gamma=g2.mul(gamma),
        delta=g2.mul(delta),
        gammaABC=gamma_abc)
    zk_extras = {}
    if zk:
        zk_extras = dict(
            delta_g1=g1.mul(delta),
            beta_g1=g1.mul(beta),
            b_query_g1=list(zip(b_idx, g1.mul_many(
                [Bt[i] for i in b_idx]))))
    pk = ProvingKey(
        alpha_g1=g1.mul(alpha),
        beta_g2=g2.mul(beta),
        delta_g2=g2.mul(delta),
        a_query=a_query,
        b_query=b_query,
        h_query_bitrev=h_query_bitrev,
        l_query=l_query,
        num_inputs=ni,
        **zk_extras)
    mark('vk_pk')
    if profile:
        spans = ['%s=%.2fs' % (n, tt - marks[i][1])
                 for i, (n, tt) in enumerate(marks[1:])]
        print('[setup profile] ' + ' '.join(spans), flush=True)
    return Keypair(pk, vk)


class ProverContext(object):
    """Reusable proving state: QAP device arrays + jitted programs + key.

    use_device_msm: route the four MSMs through ops.msm (TPU); otherwise an
    exact host Pippenger-free fallback is used.

    msm_impl: 'auto' (red-core dense single-dispatch Pallas MSM on TPU,
    generic elsewhere), 'red', 'fused' (v1-core dense), or 'generic'."""

    def __init__(self, pk, cs, use_device_msm=True, config=None,
                 msm_impl='auto', mesh=None):
        self.pk = pk
        self.qap = QAP(cs)
        self.use_device_msm = use_device_msm
        self.config = config or Config()
        assert msm_impl in ('auto', 'red', 'fused', 'generic')
        self.msm_impl = msm_impl
        self.mesh = mesh
        self._device_keys = None
        if mesh is not None:
            self._prepare_mesh_keys()
        elif use_device_msm:
            self._prepare_device_keys()

    def _prepare_mesh_keys(self):
        """Sharded production prover (multi-chip): key-query point shards
        live sharded over the mesh, the witness map runs under shard_map
        (sharded NTT with ppermute cross-stages), and all four MSMs run the
        sharded red pipeline with a gathered tree combine.

        TPU-native analog of the reference's OpenMP work splitting
        (/root/reference/src/prover_config.hpp:57-85); see SURVEY.md §5.8."""
        import jax
        import jax.numpy as jnp
        from .ops import msm_red
        from .ops import msm as msm_ops
        from .ops.fp import Fr
        from .ops.msm_red import best_c
        from .parallel.msm_red_sharded import get_sharded_msm
        from .parallel.qap_sharded import ShardedWitnessMap
        pk = self.pk
        mesh = self.mesh
        n_dev = int(np.prod(mesh.devices.shape))

        # ONE executable serves all three G1 queries: A/L/H are padded to a
        # common length so get_sharded_msm returns the same compiled
        # ShardedRedMSM (compile economy - a cold 8-device mesh otherwise
        # builds four distinct shard_map MSM programs; identity-padding the
        # shorter queries costs a few permille of per-shard work).  The G2
        # B query keeps its own (Fq2) executable.
        g1_lens = (len(pk.a_query), len(pk.l_query),
                   len(pk.h_query_bitrev))
        b_common = max(n_dev, -(-max(g1_lens) // n_dev) * n_dev)
        assert b_common % n_dev == 0 and b_common >= max(g1_lens), \
            "common pad covers every G1 query and splits evenly per device"

        def make(query_pts, g2, b_pad=None):
            pts = list(query_pts)
            if b_pad is None:
                b_pad = max(n_dev, -(-len(pts) // n_dev) * n_dev)
            pts = pts + [None] * (b_pad - len(pts))   # identity padding
            c = (self.config.multi_exp_c
                 or best_c(max(2, b_pad // n_dev)))
            lanes = (self.config.msm_max_lanes
                     or (1 << 22 if g2 else 1 << 23))
            msm = get_sharded_msm(mesh, b_pad, c, g2=g2, max_lanes=lanes)
            red = (msm_red.g2_to_red if g2 else msm_red.g1_to_red)(pts)
            return msm, msm.shard_points(red), c, b_pad

        self._a_idx = np.array([i for i, _ in pk.a_query], dtype=np.int64)
        self._b_idx = np.array([i for i, _ in pk.b_query], dtype=np.int64)
        self._a_msm, self._a_pts, self._a_c, self._a_bpad = \
            make([pt for _, pt in pk.a_query], False, b_common)
        self._b_msm, self._b_pts, self._b_c, self._b_bpad = \
            make([pt for _, pt in pk.b_query], True)
        self._l_msm, self._l_pts, self._l_c, self._l_bpad = \
            make(pk.l_query, False, b_common)
        self._h_msm, self._h_pts, self._h_c, self._h_bpad = \
            make(pk.h_query_bitrev, False, b_common)
        assert self._h_bpad >= len(pk.h_query_bitrev), \
            "H query must fit the common G1 pad"
        self._wm = ShardedWitnessMap(self.qap, mesh)
        c_h = self._h_c
        h_pad = self._h_bpad - len(pk.h_query_bitrev)
        self._h_digit_fn = jax.jit(
            lambda hm: jnp.pad(
                msm_ops.window_digits_device(Fr.from_mont(hm), c_h),
                ((0, 0), (0, h_pad))))
        # Device-resident digit extraction for A/B/L (mesh analog of the
        # single-chip msm_static_plan=True pipeline): ONE witness-limb
        # upload per proof; column gathers + window extraction + padding
        # happen on device, so no per-proof host digit matrices.
        self._a_idx_dev_m = jnp.asarray(self._a_idx)
        self._b_idx_dev_m = jnp.asarray(self._b_idx)
        ni = pk.num_inputs
        self._l_idx_dev_m = jnp.asarray(
            np.arange(ni + 1, self.qap.num_variables, dtype=np.int64))
        self._device_keys = True

    @staticmethod
    def _pad_digit_cols(digits, b_pad):
        n = digits.shape[1]
        if n == b_pad:
            return digits
        return np.concatenate(
            [digits, np.zeros((digits.shape[0], b_pad - n),
                              dtype=digits.dtype)], axis=1)

    def _impl(self):
        if self.msm_impl != 'auto':
            return self.msm_impl
        from .ops.pallas_ops import use_pallas
        return 'red' if use_pallas() else 'generic'

    def _use_fused(self):
        return self._impl() in ('red', 'fused')

    def _static(self, default):
        return (default if self.config.msm_static_plan == 'auto'
                else self.config.msm_static_plan)

    def _msm_g1(self, pts_dev, digits, c, static_plan=False):
        """G1 MSM dispatch: red-core dense single-dispatch Pallas path on
        TPU, generic multi-call path elsewhere.  Returns a host affine
        point."""
        from .ops import msm as msm_ops
        from .ops import curve as curve_ops
        impl = self._impl()
        if impl == 'red':
            from .ops import msm_red
            static_plan = self._static(static_plan)
            if not static_plan:
                digits = np.asarray(digits)
            kw = {}
            if self.config.msm_max_lanes:
                kw['max_lanes'] = self.config.msm_max_lanes
            return msm_red.msm_g1_dense_red(
                pts_dev, digits, c, static_plan=static_plan, **kw)
        if impl == 'fused':
            from .ops import pallas_msm
            return pallas_msm.msm_g1_dense_allwin(
                pts_dev, np.asarray(digits), c)
        res = msm_ops.msm_g1_device(pts_dev, digits, c)
        return curve_ops.g1_from_device(res)[0]

    def _msm_g2(self, pts_dev, digits, c):
        """G2 MSM dispatch (the B query)."""
        from .ops import msm as msm_ops
        from .ops import curve as curve_ops
        import os as _os
        impl = self._impl()
        if (impl == 'red' and not getattr(self, '_g2_generic', False)
                and _os.environ.get('ETHSNARKS_G2_IMPL') == 'generic'):
            # operator override: skip the red attempt entirely (e.g. when
            # the remote service is known to reject the big G2 module)
            self._g2_generic = True
            from .ops import curve as _curve
            import jax.numpy as _jnp
            b_dev = _curve.g2_to_device([pt for _, pt in self.pk.b_query])
            self._b_pts_generic = tuple(
                tuple(_jnp.asarray(cc) for cc in coord) for coord in b_dev)
        if impl == 'red' and getattr(self, '_g2_generic', False):
            impl = 'generic'
            pts_dev = self._b_pts_generic
            digits = np.asarray(digits)[:, :len(self.pk.b_query)]
        if impl == 'red':
            from .ops import msm_red
            kw = {}
            lanes_env = os.environ.get('ETHSNARKS_G2_LANES')
            if lanes_env:
                kw['max_lanes'] = int(lanes_env)
            elif self.config.msm_max_lanes:
                kw['max_lanes'] = self.config.msm_max_lanes
            elif len(self.pk.b_query) >= (1 << 17):
                # Fq2 doubles every dense plane: at 2^20-scale the default
                # 2^22-lane budget puts a 2-window group slab + temps right
                # at the HBM edge next to the resident keys (measured OOM
                # by 271MB at 16GB; a sparser 2^18-ish B query with its
                # bigger per-bucket capacity OOM'd the same way at 8GB for
                # the gather alone - hence the 2^17 threshold)
                kw['max_lanes'] = 1 << 21
            static_plan = self._static(False)
            if not static_plan:
                # host planning needs the digits; static keeps them
                # device-resident (np.asarray here cost a 21MB download
                # per proof at 2^18 - the tunnel reads ~7.5MB/s)
                digits = np.asarray(digits)
            import time as _t
            retries = int(os.environ.get('ETHSNARKS_G2_RETRIES', '2'))
            exc = None
            for attempt in range(1 + retries):
                try:
                    return msm_red.msm_g2_dense_red(
                        pts_dev, digits, c, static_plan=static_plan, **kw)
                except Exception as e:
                    exc = e
                    if attempt < retries:
                        # transient service hiccups (connection resets,
                        # "response body closed") succeed on retry with a
                        # warm server-side cache - retry before giving up
                        # the single-dispatch path
                        import sys
                        print('[groth16] red G2 MSM attempt %d failed '
                              '(%s); retrying' % (attempt + 1, e),
                              file=sys.stderr, flush=True)
                        _t.sleep(5)
            if True:
                # Fall back on anything that smells like a compile-service
                # failure (not just the one wording round 4 happened to
                # see); override/extend via ETHSNARKS_G2_FALLBACK_MARKERS.
                markers = os.environ.get(
                    'ETHSNARKS_G2_FALLBACK_MARKERS',
                    'remote_compile,compile,RESOURCE_EXHAUSTED,'
                    'DEADLINE_EXCEEDED,413,500,Unavailable,'
                    'capacity explosion').split(',')
                text = '%s: %s' % (type(exc).__name__, exc)
                cause = exc.__cause__ or exc.__context__
                if cause is not None:
                    text += ' <- %s: %s' % (type(cause).__name__, cause)
                if not any(m and m.lower() in text.lower()
                           for m in markers):
                    raise
                # The single-dispatch G2 module (Fq2 triples the inlined
                # body size) can exceed the remote-compile service's
                # module budget, which then routes it to a chipless AOT
                # helper that cannot initialize libtpu in this
                # environment.  Fall back to the multi-dispatch generic
                # G2 path (many small executables) - slower per proof but
                # compiles everywhere.
                import sys
                print('[groth16] red G2 MSM compile rejected by the '
                      'remote service; falling back to the generic '
                      'multi-dispatch G2 path', file=sys.stderr, flush=True)
                import jax.numpy as jnp
                b_dev = curve_ops.g2_to_device(
                    [pt for _, pt in self.pk.b_query])
                self._b_pts_generic = tuple(
                    tuple(jnp.asarray(cc) for cc in coord)
                    for coord in b_dev)
                self._g2_generic = True
                pts_dev = self._b_pts_generic
                digits = np.asarray(digits)[:, :len(self.pk.b_query)]
                impl = 'generic'
        if impl == 'fused':
            from .ops import pallas_msm
            return pallas_msm.msm_g2_dense_allwin(
                pts_dev, np.asarray(digits), c)
        res = msm_ops.msm_g2_device(pts_dev, digits, c)
        return curve_ops.g2_from_device(res)[0]

    def _prepare_device_keys(self):
        """Move key queries to the device ONCE (ProverContext semantics:
        the pk shards live on-chip across proofs).  Only the selected MSM
        implementation's coordinate format is materialized."""
        import jax.numpy as jnp
        pk = self.pk
        self._a_idx = np.array([i for i, _ in pk.a_query], dtype=np.int64)
        self._b_idx = np.array([i for i, _ in pk.b_query], dtype=np.int64)
        a_pts = [pt for _, pt in pk.a_query]
        b_pts = [pt for _, pt in pk.b_query]
        if self._impl() == 'red':
            from .ops import msm_red
            # Identity-pad the A/L queries to the H query's pow2 length so
            # ONE compiled MSM executable (the bench/H shape) serves all
            # three G1 queries - on the remote-compile service a fresh
            # 2^20-class executable is a ~25-minute compile, and padded
            # lanes carry digit 0 (bucket 0 is never folded).  Falls back
            # to per-query shapes if a query outgrows the domain.
            m = len(pk.h_query_bitrev)
            if max(len(a_pts), len(pk.l_query)) <= m:
                self._g1_bpad = m
                a_pts = a_pts + [None] * (m - len(a_pts))
                l_pts = list(pk.l_query) + [None] * (m - len(pk.l_query))
            else:
                self._g1_bpad = None
                l_pts = pk.l_query
            self._a_pts = msm_red.g1_to_red(a_pts)
            self._b_pts = msm_red.g2_to_red(b_pts)
            self._h_pts = msm_red.g1_to_red(pk.h_query_bitrev)
            self._l_pts = msm_red.g1_to_red(l_pts)
        else:
            from .ops import curve as curve_ops
            self._a_pts = tuple(jnp.asarray(x)
                                for x in curve_ops.g1_to_device(a_pts))
            b_dev = curve_ops.g2_to_device(b_pts)
            self._b_pts = tuple(tuple(jnp.asarray(c) for c in coord)
                                for coord in b_dev)
            self._h_pts = tuple(jnp.asarray(x)
                                for x in curve_ops.g1_to_device(
                                    pk.h_query_bitrev))
            self._l_pts = tuple(jnp.asarray(x)
                                for x in curve_ops.g1_to_device(
                                    pk.l_query))
        import jax
        from .ops import msm as msm_ops
        from .ops.fp import Fr
        c_h = self._pick_c(len(pk.h_query_bitrev))
        self._h_c = c_h
        self._h_digit_fn = jax.jit(
            lambda hm: msm_ops.window_digits_device(Fr.from_mont(hm), c_h))
        if self.config.msm_static_plan is True and self._impl() == 'red':
            # fully device-resident digit pipeline for A/B/L too: gather
            # the query's witness columns + extract windows on device (the
            # host path re-uploads full digit matrices every proof - the
            # stage profile showed the upload costing more than the sort)
            import jax.numpy as jnp
            self._a_idx_dev = jnp.asarray(self._a_idx.astype(np.int32))
            self._b_idx_dev = jnp.asarray(self._b_idx.astype(np.int32))
            n_l = self.qap.num_variables - pk.num_inputs - 1
            self._l_idx_dev = jnp.asarray(
                np.arange(pk.num_inputs + 1,
                          pk.num_inputs + 1 + n_l, dtype=np.int32))
        self._device_keys = True

    # ----- host MSM fallback -----

    @staticmethod
    def _host_msm(pairs):
        """Sum of scalar*point (python ints / bn254 points)."""
        out = None
        for s, pt in pairs:
            if s and pt is not None:
                out = add(out, multiply(pt, s))
        return out

    def _pick_c(self, n):
        from .ops import msm as msm_ops
        if self.config.multi_exp_c:
            c = self.config.multi_exp_c
        elif self._impl() == 'red':
            from .ops.msm_red import best_c
            return best_c(n)
        else:
            c = msm_ops.default_window_bits(n)
        if self._use_fused():
            # v1 dense-fused fold kernel holds (L, 2^c) blocks in VMEM;
            # c=13 blows the 16MB scoped budget (measured: 28.8MB); the
            # dense pipelines also need >= 128 buckets (Mosaic lane
            # minimum), so 7 <= c <= 10
            c = min(max(c, 7), 10 if self._impl() == 'fused' else 13)
        return c

    def prove(self, witness_values, primary_input=None, blind=False,
              rng=None):
        """witness_values: full assignment [1, x_1.., aux..] (python ints).

        Device path: key queries are device-resident (prepared once); the H
        scalars never leave the device (witness map -> from_mont -> digit
        extraction -> MSM all on-chip).

        blind: add Groth16 r/s zero-knowledge blinding (A += r*delta,
        B += s*delta, C += s*A + r*B1 - r*s*delta).  Requires a key built
        with generator(zk=True) - the fork's nozk keys drop the needed
        delta_g1/beta_g1/G1-B-query (hpp:209-233) and prove
        deterministically.  The extra G1 B-query evaluation runs on host
        (blinded proving is not the throughput path)."""
        pk = self.pk
        ni = pk.num_inputs
        w = [int(v) % P for v in witness_values]
        assert w[0] == 1
        if blind and not pk.has_zk_extras:
            raise ValueError(
                "blind=True needs a zk-form key: generate with "
                "generator(zk=True); nozk keys drop delta_g1/beta_g1/"
                "B1-query (reference hpp:209-233)")

        if self.mesh is not None:
            import jax.numpy as jnp
            from .ops.fp import Fr
            w_limbs = Fr.to_limbs_fast(w)
            # ONE witness-limb upload feeds the sharded witness map AND
            # the on-device digit extraction of every query (no per-proof
            # host digit matrices - same economy as the single-chip
            # msm_static_plan=True pipeline).
            wl_dev = jnp.asarray(w_limbs)
            h_mont = self._wm(Fr.to_mont_jit(wl_dev))
            h_digits = self._h_digit_fn(h_mont)
            h_eval = self._h_msm.call_device(self._h_pts, h_digits)
            a_digits = _digit_extract_pad_jit(self._a_c, self._a_bpad)(
                wl_dev, self._a_idx_dev_m)
            a_eval = self._a_msm.call_device(self._a_pts, a_digits)
            b_digits = _digit_extract_pad_jit(self._b_c, self._b_bpad)(
                wl_dev, self._b_idx_dev_m)
            b_eval = self._b_msm.call_device(self._b_pts, b_digits)
            l_digits = _digit_extract_pad_jit(self._l_c, self._l_bpad)(
                wl_dev, self._l_idx_dev_m)
            l_eval = self._l_msm.call_device(self._l_pts, l_digits)
        elif not self.use_device_msm:
            # fully host-side prove: exact bigint witness map, no XLA
            # program anywhere (compile economy for CI boxes and the
            # dryrun's single-chip comparison prover)
            h_bitrev = self.qap.witness_map_host(w)
            a_pairs = [(w[i], pt) for i, pt in pk.a_query]
            b_pairs = [(w[i], pt) for i, pt in pk.b_query]
            h_pairs = [(h_bitrev[p], pt)
                       for p, pt in enumerate(pk.h_query_bitrev)
                       if pt is not None]
            l_pairs = [(w[ni + 1 + j], pt)
                       for j, pt in enumerate(pk.l_query) if pt is not None]
            a_eval = self._host_msm(a_pairs)
            b_eval = self._host_msm(b_pairs)
            h_eval = self._host_msm(h_pairs)
            l_eval = self._host_msm(l_pairs)
        else:
            import os
            import time as _time
            from .ops import msm as msm_ops
            from .ops.fp import Fr
            profile = os.environ.get("ETHSNARKS_PROVE_PROFILE") == "1"
            marks = [('start', _time.perf_counter())]

            def mark(name, sync=None):
                if profile:
                    if sync is not None:
                        import jax
                        jax.block_until_ready(sync)
                    marks.append((name, _time.perf_counter()))

            # ONE limb decomposition of the witness feeds the device
            # witness map AND every host digit extraction (uint32 numpy
            # passes instead of python-bigint passes per MSM)
            w_limbs = Fr.to_limbs_fast(w)
            mark('witness_limbs')

            h_bitrev_mont = self.qap.witness_map_device_limbs(w_limbs)
            mark('witness_map_ntt', sync=h_bitrev_mont)
            h_digits = self._h_digit_fn(h_bitrev_mont)
            h_eval = self._msm_g1(self._h_pts, h_digits, self._h_c,
                                  static_plan=True)
            mark('h_msm')

            bpad = getattr(self, '_g1_bpad', None)
            if bpad is not None:
                # A/L share the H executable: same b, same c
                a_c = l_c = self._h_c
            else:
                a_c = self._pick_c(len(self._a_idx))
                l_c = self._pick_c(self.qap.num_variables - ni - 1)
            b_c = int(os.environ.get('ETHSNARKS_G2_C', '0')) \
                or self._pick_c(len(self._b_idx))
            if (self.config.msm_static_plan is True
                    and self._impl() == 'red'):
                # device-resident digit pipeline: ONE witness-limb upload
                # feeds on-device column gathers + window extraction for
                # all three queries (no per-proof digit-matrix uploads)
                import jax.numpy as jnp
                wl_dev = jnp.asarray(w_limbs)
                if bpad is not None:
                    a_digits = _digit_extract_pad_jit(a_c, bpad)(
                        wl_dev, self._a_idx_dev)
                    l_digits = _digit_extract_pad_jit(l_c, bpad)(
                        wl_dev, self._l_idx_dev)
                else:
                    a_digits = _digit_extract_jit(a_c)(
                        wl_dev, self._a_idx_dev)
                    l_digits = _digit_extract_jit(l_c)(
                        wl_dev, self._l_idx_dev)
                b_digits = _digit_extract_jit(b_c)(wl_dev, self._b_idx_dev)
            else:
                a_digits = msm_ops.window_digits_from_limbs_np(
                    w_limbs[:, self._a_idx], a_c)
                b_digits = msm_ops.window_digits_from_limbs_np(
                    w_limbs[:, self._b_idx], b_c)
                l_digits = msm_ops.window_digits_from_limbs_np(
                    w_limbs[:, ni + 1:], l_c)
                if bpad is not None:
                    a_digits = self._pad_digit_cols(a_digits, bpad)
                    l_digits = self._pad_digit_cols(l_digits, bpad)
            mark('abl_digits')
            a_eval = self._msm_g1(self._a_pts, a_digits, a_c)
            mark('a_msm')
            b_eval = self._msm_g2(self._b_pts, b_digits, b_c)
            mark('b_msm_g2')
            l_eval = self._msm_g1(self._l_pts, l_digits, l_c)
            mark('l_msm')
            if profile:
                spans = ['%s=%.3fs' % (n, t - marks[i][1])
                         for i, (n, t) in enumerate(marks[1:])]
                print('[prove profile] ' + ' '.join(spans), flush=True)

        g_a = add(pk.alpha_g1, a_eval)
        g_b = add(pk.beta_g2, b_eval)
        g_c = add(h_eval, l_eval)
        if blind:
            rng = rng or (lambda: secrets.randbelow(P - 1) + 1)
            r, s = rng(), rng()
            b1_eval = self._host_msm(
                [(w[i], pt) for i, pt in pk.b_query_g1])
            g_b1 = add(pk.beta_g1, b1_eval)           # B in G1
            g_a = add(g_a, multiply(pk.delta_g1, r))
            g_b = add(g_b, multiply(pk.delta_g2, s))
            g_b1 = add(g_b1, multiply(pk.delta_g1, s))
            g_c = add(g_c, add(
                multiply(g_a, s),
                add(multiply(g_b1, r),
                    neg(multiply(pk.delta_g1, r * s % P)))))
        return Proof(A=g_a, B=g_b, C=g_c, input=w[1:1 + ni])


def prove(context, witness_values):
    """One-call helper (parity: src/stubs.cpp:42-47)."""
    return context.prove(witness_values)
