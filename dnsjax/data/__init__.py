from dnsjax.data.base import BaseDataset, get_dataset  # noqa: F401
from dnsjax.data.synthetic import SyntheticDataset  # noqa: F401
