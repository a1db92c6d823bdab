"""Index orchestration: pipeline, discovery, file manifest."""

from .db_discovery import (  # noqa: F401
    find_best_database,
    find_databases,
    is_valid_database,
    register_repo,
    resolve_database_with_message,
    unregister_repo,
)
from .file_meta import FileMetaStore  # noqa: F401
from .pipeline import (  # noqa: F401
    IndexOptions,
    IndexStats,
    clear_database,
    db_stats,
    find_git_root,
    get_db_path_smart,
    index,
    index_quiet,
    read_metadata,
)
