package graft.lang

/** Deterministic embedded seed text used to train the language-ID LMs
  * and the perplexity LM. Hand-written generic prose (no external data,
  * per the build rules); a few KB per language is plenty for a
  * char-trigram profile.
  */
object SeedCorpus {

  val en: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog near the river bank",
    "i think we should look at the data before we make any decision",
    "could you please explain how this function works and what it returns",
    "the weather today is quite nice and we are planning a short walk",
    "thank you for your help with the report it was very useful indeed",
    "when the system receives a request it checks the user permissions first",
    "there are many ways to solve this problem but only a few are simple",
    "please make sure the tests pass before you merge the change",
    "the meeting has been moved to thursday afternoon at three o'clock",
    "a good answer explains not only what happened but also why it happened",
    "we need to count how many rows of the table contain missing values",
    "this is a longer conversation between a user and an assistant about code",
    "the model reads the input text and predicts the most likely language",
    "if you have any further questions feel free to ask at any time",
    "the cache was empty so the service had to fetch the value again",
    "every morning she reads the news and drinks a small cup of coffee",
    "our team shipped the new feature last week and users seem happy",
    "it is important to write clear and simple sentences for the reader",
    "what is the best way to learn a new programming language quickly",
    "the results of the experiment were consistent with our expectations",
    "he opened the window because the room was getting too warm",
    "numbers like 42 and 1000 appear in ordinary english sentences too",
    "software engineering is mostly about managing complexity over time",
    "the train arrives at the central station every twenty minutes"
  )

  val fr: Seq[String] = Seq(
    "le rapide renard brun saute par dessus le chien paresseux pres de la riviere",
    "je pense que nous devrions regarder les donnees avant de prendre une decision",
    "pourriez vous expliquer comment cette fonction marche et ce qu'elle retourne",
    "le temps aujourd'hui est tres agreable et nous allons faire une promenade",
    "merci beaucoup pour votre aide avec le rapport il etait tres utile",
    "quand le systeme recoit une demande il verifie d'abord les droits de l'utilisateur",
    "il y a beaucoup de manieres de resoudre ce probleme mais peu sont simples",
    "veuillez vous assurer que les tests passent avant de fusionner le changement",
    "la reunion a ete deplacee a jeudi apres midi a quinze heures",
    "une bonne reponse explique non seulement ce qui s'est passe mais aussi pourquoi",
    "nous devons compter combien de lignes de la table contiennent des valeurs manquantes",
    "ceci est une longue conversation entre un utilisateur et un assistant",
    "le modele lit le texte d'entree et predit la langue la plus probable",
    "si vous avez d'autres questions n'hesitez pas a demander a tout moment",
    "le cache etait vide donc le service a du chercher la valeur encore",
    "chaque matin elle lit les nouvelles et boit une petite tasse de cafe",
    "notre equipe a livre la nouvelle fonctionnalite la semaine derniere",
    "il est important d'ecrire des phrases claires et simples pour le lecteur",
    "quelle est la meilleure facon d'apprendre un nouveau langage rapidement",
    "les resultats de l'experience etaient conformes a nos attentes",
    "il a ouvert la fenetre parce que la piece devenait trop chaude",
    "des nombres comme 42 et 1000 apparaissent aussi dans des phrases francaises",
    "le genie logiciel consiste surtout a gerer la complexite dans le temps",
    "le train arrive a la gare centrale toutes les vingt minutes"
  )

  val de: Seq[String] = Seq(
    "der schnelle braune fuchs springt ueber den faulen hund am fluss",
    "ich denke wir sollten die daten ansehen bevor wir eine entscheidung treffen",
    "koennten sie bitte erklaeren wie diese funktion arbeitet und was sie liefert",
    "das wetter ist heute sehr schoen und wir planen einen kurzen spaziergang",
    "vielen dank fuer ihre hilfe mit dem bericht er war sehr nuetzlich",
    "wenn das system eine anfrage erhaelt prueft es zuerst die rechte des nutzers",
    "es gibt viele wege dieses problem zu loesen aber nur wenige sind einfach",
    "bitte stellen sie sicher dass die tests laufen bevor sie die aenderung mischen",
    "das treffen wurde auf donnerstag nachmittag um drei uhr verschoben",
    "eine gute antwort erklaert nicht nur was geschah sondern auch warum",
    "wir muessen zaehlen wie viele zeilen der tabelle fehlende werte enthalten",
    "dies ist ein langes gespraech zwischen einem nutzer und einem assistenten",
    "das modell liest den eingabetext und sagt die wahrscheinlichste sprache voraus",
    "wenn sie weitere fragen haben koennen sie jederzeit gerne fragen",
    "der zwischenspeicher war leer also musste der dienst den wert neu holen",
    "jeden morgen liest sie die nachrichten und trinkt eine kleine tasse kaffee",
    "unser team hat die neue funktion letzte woche ausgeliefert",
    "es ist wichtig klare und einfache saetze fuer den leser zu schreiben",
    "was ist der beste weg eine neue programmiersprache schnell zu lernen",
    "die ergebnisse des versuchs stimmten mit unseren erwartungen ueberein",
    "er oeffnete das fenster weil der raum zu warm wurde",
    "zahlen wie 42 und 1000 kommen auch in deutschen saetzen vor",
    "softwaretechnik bedeutet vor allem komplexitaet ueber die zeit zu beherrschen",
    "der zug kommt alle zwanzig minuten am hauptbahnhof an"
  )

  val es: Seq[String] = Seq(
    "el rapido zorro marron salta sobre el perro perezoso cerca del rio",
    "creo que deberiamos mirar los datos antes de tomar una decision",
    "podria explicar como funciona esta funcion y que es lo que devuelve",
    "el tiempo hoy es muy agradable y vamos a dar un paseo corto",
    "muchas gracias por su ayuda con el informe fue muy util",
    "cuando el sistema recibe una peticion comprueba primero los permisos",
    "hay muchas maneras de resolver este problema pero pocas son simples",
    "asegurese de que las pruebas pasan antes de fusionar el cambio",
    "la reunion se ha movido al jueves por la tarde a las tres",
    "una buena respuesta explica no solo que paso sino tambien por que",
    "tenemos que contar cuantas filas de la tabla contienen valores faltantes",
    "esta es una conversacion larga entre un usuario y un asistente",
    "el modelo lee el texto de entrada y predice el idioma mas probable",
    "si tiene mas preguntas no dude en preguntar en cualquier momento",
    "cada manana ella lee las noticias y bebe una pequena taza de cafe",
    "nuestro equipo entrego la nueva funcion la semana pasada",
    "es importante escribir frases claras y simples para el lector",
    "cual es la mejor manera de aprender un nuevo lenguaje rapido",
    "los resultados del experimento coincidieron con nuestras expectativas",
    "abrio la ventana porque la habitacion se estaba poniendo caliente",
    "numeros como 42 y 1000 aparecen tambien en frases espanolas",
    "el tren llega a la estacion central cada veinte minutos"
  )

  /** Code / JSON-ish agent-tool payloads, mixed into the perplexity LM
    * training set so that legitimate tool-call turns do not score as
    * out-of-distribution gibberish.
    */
  val code: Seq[String] = Seq(
    """{"name": "search", "args": {"query": "spark window functions", "limit": 10}}""",
    """{"status": "ok", "rows": 42, "columns": ["conv_id", "turn_idx", "text"]}""",
    """def main(args: Array[String]): Unit = { println("hello world") }""",
    """SELECT conv_id, count(*) AS n FROM transcripts GROUP BY conv_id ORDER BY n DESC""",
    """{"tool": "read_file", "path": "/tmp/data/input.parquet", "offset": 0}""",
    """val df = spark.read.parquet(path).filter(col("keep") === true)""",
    """{"error": null, "result": {"score": 0.98, "label": "keep"}}""",
    """for i in range(10): print(i * 2)""",
    """{"name": "execute_sql", "args": {"sql": "select 1", "timeout": 30}}""",
    """GET /api/v1/items?page=2&size=50 HTTP/1.1 host example.com accept application/json""",
    """{"metric": "throughput", "value": 125000.5, "unit": "turns/sec"}""",
    """import org.apache.spark.sql.functions._ ; val out = df.groupBy("lang").count()""",
    """{"conv_id": "c-000123", "turn_idx": 7, "role": "tool", "ok": true}""",
    """curl -s -X POST https://api.example.com/v1/run -d '{"id": 99}'"""
  )

  val byLang: Map[String, Seq[String]] =
    Map("en" -> en, "fr" -> fr, "de" -> de, "es" -> es)
}
