from .pages import synthesize_pages, PAGES_SCHEMA, load_table

__all__ = ["synthesize_pages", "PAGES_SCHEMA", "load_table"]
