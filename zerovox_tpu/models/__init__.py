from zerovox_tpu.models import fs2, hifigan, resnetse, styletts  # noqa: F401
