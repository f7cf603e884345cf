from snag_tpu.models.encoder import MultiModalEncoder, FeaturePack, FeatureStats  # noqa: F401
from snag_tpu.models.snag import SNAG  # noqa: F401
from snag_tpu.models.meaformer import MEAformer  # noqa: F401
from snag_tpu.models.mclea import MCLEA  # noqa: F401
from snag_tpu.models.eva import EVA  # noqa: F401
from snag_tpu.models.msnea import MSNEA  # noqa: F401


def build_model(cfg, data):
    """5-way model dispatch (reference: SNAG_MMEA/main.py:58-75)."""
    from snag_tpu.models import snag, meaformer, mclea, eva, msnea
    cls = {"SNAG": snag.SNAG, "MEAformer": meaformer.MEAformer,
           "MCLEA": mclea.MCLEA, "EVA": eva.EVA, "MSNEA": msnea.MSNEA}[cfg.model_name]
    return cls.from_data(cfg, data)
