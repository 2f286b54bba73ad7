"""Site parsers.

Pure-Python extraction cores (shared with the test simulator) plus the
Arrow/pandas UDF wrappers the engine uses. Output is byte-identical per
URL to the reference BeautifulSoup parsers (see each module docstring
for file:line citations).
"""

from crawlspark.parsers.seek import (  # noqa: F401
    extract_seek_links,
    parse_seek_detail,
)
from crawlspark.parsers.jora import (  # noqa: F401
    extract_jora_links,
    parse_jora_detail,
)
from crawlspark.parsers.careerone import parse_careerone_page  # noqa: F401
