"""pitchextractor_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
JDC-PitchExtractor training stack.

The reference implementation (martinambrus/PitchExtractor) is a single-device
PyTorch pipeline: soundfile -> torchaudio mel front-end -> PyWorld/CREPE/
SwiftF0/Praat F0 label cascade -> JDCNet CRNN -> AdamW/OneCycle training loop.
This package re-designs every layer TPU-first:

- ``io``       host audio decode (own WAV codec, partial reads) — reference:
               meldataset.py:285-320 (libsndfile).
- ``dsp``      STFT/mel/log-norm front-end, resampling, biquads — numpy host
               path (cache-compatible) + batched JAX path + Pallas fusions —
               reference: torchaudio MelSpectrogram (meldataset.py:77).
- ``labels``   the F0 labeling subsystem: backend registry, cascade facade,
               cache identifiers, and TPU-native batched trackers —
               reference: f0_backends.py.
- ``models``   JDCNet (Kum et al. 2019) in flax.linen with switchable
               BiLSTM (lax.scan) / Transformer sequence heads — reference:
               model.py.
- ``data``     host input pipeline, disk caches byte-compatible with the
               reference formats, synthetic data — reference: meldataset.py,
               Utils/synthetic.py.
- ``train``    optax AdamW + OneCycle, bf16 mixed precision, gradient
               rematerialisation, data-parallel pjit over a device mesh,
               checkpoint/resume — reference: trainer.py, optimizers.py.
- ``infer``    a single jitted wav->F0 graph with 192/48 overlap chunking —
               reference: notebook ``predict_f0``.
- ``eval``     scripted robustness suites + metrics (RPA/RCA/VUV/...) —
               reference: Utils/*.ipynb, Utils/dynamic_pitch_tools.py.
- ``parallel`` device mesh / sharding helpers (new layer; the reference has
               no distributed support at all, SURVEY.md §2.11).
"""

__version__ = "0.1.0"
