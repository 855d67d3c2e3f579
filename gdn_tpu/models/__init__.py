from gdn_tpu.models.dtod import DtoDNet
from gdn_tpu.models.rtod import RtoDNet
from gdn_tpu.models.encoder import Encoder
from gdn_tpu.models.decoder import Decoder
