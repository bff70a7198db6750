from octa_tpu.utils.enums import Phase, Task  # noqa: F401
from octa_tpu.utils.config import (  # noqa: F401
    apply_cli_overrides,
    dump_config,
    load_config,
    parse_cli_overrides,
    set_in_config,
)
