"""Framework-wide constants: modality ids, registry keys, serving-state flags.

Reference parity: ``/root/reference/antmmf/common/constants.py`` (modality ids :27-32,
serving states :69-72, registry keys :20).
"""

# ----------------------------------------------------------------- modalities
IMAGE_MODALITY = "image"
VIDEO_MODALITY = "video"
TEXT_MODALITY = "text"
AUDIO_MODALITY = "audio"
VISION_MODALITY = (IMAGE_MODALITY, VIDEO_MODALITY)

# ------------------------------------------------------------- registry keys
REGISTRY_FOR_CONFIG = "config"
REGISTRY_FOR_WRITER = "writer"
REGISTRY_FOR_MODEL = "model"
REGISTRY_FOR_CURRENT_DEVICE = "current_device"

# ------------------------------------------------------------ serving states
STATE_KEY = "predictor_state"
STATE_ONLINE_SERVING = "online_serving"
STATE_LOCAL_TRAINING = "local_training"

# ----------------------------------------------------------------- run types
RUN_TYPE_TRAIN = "train"
RUN_TYPE_VAL = "val"
RUN_TYPE_TEST = "test"
RUN_TYPES = (RUN_TYPE_TRAIN, RUN_TYPE_VAL, RUN_TYPE_TEST)

# --------------------------------------------------------------- batch field
SAMPLE_LIST_FIELDS = ("dataset_type", "dataset_name")

# ------------------------------------------------------------- special ids
LM_IGNORE_INDEX = -1  # lm_label_ids padding value (reference text_processors semantics)
TEXT_PAD_INDEX = 0

# ------------------------------------------------------------- mesh axis names
MESH_AXIS_DATA = "data"
MESH_AXIS_FSDP = "fsdp"
MESH_AXIS_MODEL = "model"
MESH_AXIS_EXPERT = "expert"
MESH_AXIS_SEQ = "seq"
