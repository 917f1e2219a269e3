"""Engine package. Submodules resolve lazily so the multiprocess eval
workers (engine/_eval_worker.py, numpy-only) don't drag jax + the model
stack into every spawned process."""


def __getattr__(name):
    if name in ("inference", "trainer", "predictor", "paste"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
