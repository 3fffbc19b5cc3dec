"""Model registry.

The reference is an HPC proxy app, not an ML framework: its only "model" is
the distributed k-mer table itself — the hash-sharded state that owner ranks
hold and update (SURVEY §2.7 "hash-sharded model/table parallelism").  That
state lives in `..table` (ShardTable / MWShardTable / SingletonFilter) with
its parallel layout in `..parallel.count_step`.  `KmerDHT` is the
library-facing facade over that state — the `KmerDHT<MAX_K>` API analogue
(construct, add reads, finish_updates, point queries, dump) for programmatic
users; the pipeline drives the same steps with its own batching loop.
"""

from ..table.shard_table import ShardTable  # noqa: F401
from ..table.shard_table_mw import MWShardTable  # noqa: F401
from ..table.singleton_filter import SingletonFilter  # noqa: F401
from .kmer_dht import KmerDHT  # noqa: F401
