"""audio_only_speech_separation_tpu — a TPU-native speech-separation framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
`look2hear`-style reference toolkit (single-channel audio-only speech
separation): the same YAML config schema, model zoo, loss/metric families,
data manifests and experiment artifact layout — implemented TPU-first with
functional models, `jax.sharding.Mesh` + `pjit` data parallelism, scan-based
RNNs with fused gates, and Pallas kernels on the hot paths.

Subpackages
-----------
- ``ops``      TPU compute primitives (framed conv filterbanks, scan-LSTM,
               chunking/overlap-add, norms, STFT, attention, Pallas kernels)
- ``models``   model zoo (TasNet/DPRNN/DPTNet, ConvTasNet, BSRNN, Sepformer,
               TDANet, AFRCNN, DPRNNTasNet, Sandglasset) + registry
- ``losses``   PIT / MixIT wrappers and the NegSDR family
- ``metrics``  SI-SNR(i)/SDR(i) trackers with CSV output
- ``data``     JSON-manifest datasets + threaded prefetching loaders
- ``parallel`` mesh bootstrap and sharding helpers
- ``train``    explicit training loop, optimizers, schedulers, checkpoints
- ``utils``    config reflection, profiling, misc helpers
- ``layers``   standalone reusable layer library (filterbank factory, STFT)
"""

__version__ = "0.1.0"

# Lazy subpackage access: `import audio_only_speech_separation_tpu as aoss;
# aoss.models` works without paying import cost for unused subsystems.
import importlib as _importlib

_SUBPACKAGES = (
    "ops",
    "models",
    "losses",
    "metrics",
    "data",
    "parallel",
    "train",
    "utils",
    "layers",
)


def __getattr__(name):
    if name in _SUBPACKAGES:
        return _importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBPACKAGES))
